"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
VLDB 2019), the log-bucketed counterpart to Q-Digest's absolute-rank
guarantee: any returned quantile q̂ satisfies |q̂ - q| <= alpha * q,
independent of the value's magnitude. That is the guarantee you want
for long-tailed web metrics (latency, doc length, file size), where a
rank-error sketch can be off by orders of magnitude in value space.

Design (same mergeable-UDAF contract as the other families here and
as the reference's merge, qcore.c:254-306):

- bucket i = ceil(log_gamma(v)) with gamma = (1+alpha)/(1-alpha);
  every v in (gamma^(i-1), gamma^i] maps to i, and the bucket
  midpoint 2*gamma^i/(gamma+1) is within alpha of any member.
- state is a SPARSE sorted (index -> count) pair of numpy arrays plus
  a zero-value counter; update is np.unique over vectorized
  log-index computation — no per-row Python.
- merge = pointwise count addition (associative, commutative, lossless:
  a merged sketch is bit-identical to the single-pass sketch of the
  concatenated stream, the strongest merge law in this repo).
- ``max_bins`` collapses the LOWEST buckets (standard collapsing
  DDSketch) so memory is bounded regardless of data range; upper
  quantiles keep the alpha guarantee, collapsed low quantiles degrade
  gracefully and ``collapsed`` records that it happened.

Domain: non-negative values (zero tracked exactly; negatives raise —
mirror of the two-sided variant is out of scope, use qdigest's signed
path for signed domains).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HDR = struct.Struct("<4sBdIqqB")  # magic, ver, alpha, max_bins, n, zero, collapsed
_MAGIC = b"DDS1"


class DDSketch:
    __slots__ = ("alpha", "gamma", "_lg", "idx", "cnt", "zero", "n",
                 "max_bins", "collapsed")

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._lg = math.log(self.gamma)
        self.idx = np.empty(0, dtype=np.int32)
        self.cnt = np.empty(0, dtype=np.int64)
        self.zero = 0
        self.n = 0
        self.max_bins = int(max_bins)
        self.collapsed = False

    # -- update ---------------------------------------------------------

    def update_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return
        if np.any(v < 0):
            raise ValueError("DDSketch domain is non-negative")
        w = None if weights is None else np.asarray(weights, dtype=np.int64)
        zero = v == 0
        if zero.any():
            self.zero += int(w[zero].sum()) if w is not None else int(zero.sum())
            v, w = v[~zero], (w[~zero] if w is not None else None)
        if len(v):
            ib = np.ceil(np.log(v) / self._lg).astype(np.int32)
            if w is None:
                ui, uc = np.unique(ib, return_counts=True)
                uc = uc.astype(np.int64)
            else:
                ui, inv = np.unique(ib, return_inverse=True)
                # int64 scatter-add keeps merge lossless above 2^53
                uc = np.zeros(len(ui), dtype=np.int64)
                np.add.at(uc, inv, w)
            self._combine(ui, uc)
        self.n = self.zero + int(self.cnt.sum())

    def _combine(self, ui: np.ndarray, uc: np.ndarray) -> None:
        if len(self.idx):
            ui = np.concatenate([self.idx, ui])
            uc = np.concatenate([self.cnt, uc])
            s = np.argsort(ui, kind="stable")
            ui, uc = ui[s], uc[s]
            uniq, start = np.unique(ui, return_index=True)
            uc = np.add.reduceat(uc, start)
            ui = uniq
        self.idx, self.cnt = ui.astype(np.int32), uc.astype(np.int64)
        if len(self.idx) > self.max_bins:
            # collapse the lowest buckets into the cut bucket
            cut = len(self.idx) - self.max_bins
            low = int(self.cnt[: cut + 1].sum())
            self.idx = self.idx[cut:].copy()
            self.cnt = self.cnt[cut:].copy()
            self.cnt[0] = low
            self.collapsed = True

    # -- query ----------------------------------------------------------

    def quantile(self, p: float) -> float:
        """Value at rank max(1, ceil(p*n)) — the repo's shared rank
        convention (qdigest.py percentile); relative error <= alpha
        for un-collapsed buckets."""
        if self.n == 0:
            raise ValueError("empty sketch")
        rank = max(1, math.ceil(p * self.n))
        if rank <= self.zero:
            return 0.0
        cum = self.zero + np.cumsum(self.cnt)
        i = int(np.searchsorted(cum, rank))
        g = self.gamma
        return 2.0 * (g ** float(self.idx[i])) / (g + 1.0)

    def quantiles(self, ps) -> list:
        return [self.quantile(p) for p in ps]

    # -- merge ----------------------------------------------------------

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError("DDSketch alpha mismatch")
        self.zero += other.zero
        self.collapsed = self.collapsed or other.collapsed
        if len(other.idx):
            self._combine(other.idx.copy(), other.cnt.copy())
        self.n = self.zero + int(self.cnt.sum())
        return self

    # -- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                _HDR.pack(_MAGIC, 1, self.alpha, self.max_bins, self.n,
                          self.zero, int(self.collapsed)),
                np.int32(len(self.idx)).tobytes(),
                self.idx.tobytes(),
                self.cnt.tobytes(),
            ]
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "DDSketch":
        magic, ver, alpha, max_bins, n, zero, collapsed = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad DDSketch buffer")
        sk = cls(alpha, max_bins)
        sk.n, sk.zero, sk.collapsed = n, zero, bool(collapsed)
        off = _HDR.size
        nb = int(np.frombuffer(buf, dtype=np.int32, count=1, offset=off)[0])
        off += 4
        sk.idx = np.frombuffer(buf, dtype=np.int32, count=nb, offset=off).copy()
        off += 4 * nb
        sk.cnt = np.frombuffer(buf, dtype=np.int64, count=nb, offset=off).copy()
        return sk

    def __repr__(self) -> str:
        return (f"DDSketch(alpha={self.alpha}, bins={len(self.idx)}, "
                f"n={self.n}, collapsed={self.collapsed})")
