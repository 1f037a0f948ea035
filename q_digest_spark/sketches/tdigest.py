"""t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles
Using t-Digests", 2019) — merging variant, vectorized.

No counterpart in the reference repo; included per BASELINE.json
north_rule for float quantiles with tail-accurate error.

Design note (divergence from Dunning's sequential merge loop, on
purpose): instead of the data-dependent sequential pass, incoming
points + existing centroids are sorted and **binned by the k1 scale
function** k(q) = (delta / 2pi) * asin(2q - 1): each item's cluster id
is floor(k(q_mid)), and a groupby over cluster ids produces the new
centroids. This is fully numpy-vectorized (no per-centroid Python
loop), keeps every cluster within one k-unit — the same size invariant
Dunning's merge maintains — and makes compression deterministic given
input order. Accuracy is empirically equivalent (asserted in tests)
and the state stays O(delta).

Quantile queries interpolate between centroid means assuming each
centroid straddles half its weight (the standard t-digest estimator).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBHqdq")  # magic, ver, delta, n(weight), _pad, m
_MAGIC = b"TDG1"


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf_v", "_buf_w", "_buf_limit")

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_limit = 16 * self.delta

    # -------------------------------------------------------------- state
    @property
    def n(self) -> int:
        return int(self.weights.sum() + sum(w.sum() for w in self._buf_w))

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _flush(self) -> None:
        if not self._buf_v and len(self.means) <= 2 * self.delta:
            return
        vs = [self.means] + self._buf_v
        ws = [self.weights] + self._buf_w
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        self._buf_v, self._buf_w = [], []
        if len(v) == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2) / total
        cluster = np.floor(self._k(q_mid)).astype(np.int64)
        # stable group-by over sorted cluster ids
        uniq, start = np.unique(cluster, return_index=True)
        wsum = np.add.reduceat(w, start)
        vsum = np.add.reduceat(v * w, start)
        self.means = vsum / wsum
        self.weights = wsum

    # ------------------------------------------------------------- update
    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(values)
        values = values[mask]
        if len(values) == 0:
            return
        if weights is None:
            weights = np.ones(len(values), dtype=np.float64)
        else:
            weights = np.asarray(weights, dtype=np.float64)[mask]
        self._buf_v.append(values)
        self._buf_w.append(weights)
        if sum(len(b) for b in self._buf_v) >= self._buf_limit:
            self._flush()

    # -------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        self.delta = max(self.delta, other.delta)
        other._flush()
        if len(other.means):
            self._buf_v.append(other.means)
            self._buf_w.append(other.weights)
        self._flush()
        return self

    # -------------------------------------------------------------- query
    def quantile(self, p: float) -> float:
        self._flush()
        if len(self.means) == 0:
            raise ValueError("empty sketch")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - w / 2  # mid-point ranks
        target = p * total
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target, side="right"))
        t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + t * (self.means[i] - self.means[i - 1]))

    def quantiles(self, ps) -> list[float]:
        return [self.quantile(p) for p in ps]

    def trimmed_mean(self, p_lo: float, p_hi: float) -> float:
        """Mean of the values between the p_lo and p_hi quantiles (the
        robust-statistics ask t-digest is built for): each centroid
        contributes the fraction of its weight that falls inside the
        [p_lo*n, p_hi*n] rank window — partial inclusion at the
        boundary centroids, so the estimate degrades smoothly with
        centroid resolution instead of jumping per centroid."""
        self._flush()
        w = self.weights
        total = w.sum()
        if total == 0:
            raise ValueError("empty sketch")
        lo_w, hi_w = p_lo * total, p_hi * total
        starts = np.cumsum(w) - w
        w_in = np.clip(np.minimum(starts + w, hi_w) - np.maximum(starts, lo_w), 0, None)
        tw = w_in.sum()
        if tw <= 0:
            return self.quantile((p_lo + p_hi) / 2.0)
        return float((self.means * w_in).sum() / tw)

    def rank_of(self, value: float) -> float:
        self._flush()
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - w / 2
        r = float(np.interp(value, self.means, cum, left=0.0, right=total))
        return r / total

    # ---------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        self._flush()
        hdr = _HDR.pack(_MAGIC, 1, self.delta, 0, 0.0, len(self.means))
        return hdr + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        magic, ver, delta, _, _, m = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad TDigest buffer")
        sk = cls(delta)
        o = _HDR.size
        sk.means = np.frombuffer(buf, dtype=np.float64, count=m, offset=o).copy()
        sk.weights = np.frombuffer(buf, dtype=np.float64, count=m, offset=o + 8 * m).copy()
        return sk

    def __repr__(self) -> str:
        return f"TDigest(delta={self.delta}, centroids={len(self.means)}, n={self.n})"
