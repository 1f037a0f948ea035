"""Misra-Gries frequent-items summary (Misra & Gries 1982), the
deterministic counterpart to Count-Min for heavy-hitter queries, with
the mergeable-summaries merge of Agarwal, Cormode, Huang, Phillips,
Wei & Yi (PODS 2012, §3): combine counters pointwise, then subtract
the (k+1)-th largest counter from all and drop the non-positives.

Guarantees (k counters over a stream of total weight n):
  est(x) <= true(x) <= est(x) + err, with err <= n / (k + 1),
and every item with true(x) > n/(k+1) is present in the summary.
The ``err`` field tracks the actual cumulative decrement, which is
usually far below the worst-case n/(k+1) bound.

Unlike Count-Min this summary keeps the item KEYS, so heavy-hitter
queries need no candidate-generation pass — the summary IS the
candidate set, which is exactly what you want for "top domains /
tokens over a 10^12-page crawl": one scan, O(partitions * k) shuffled
rows, deterministic error.

The hot path is fully vectorized: a batch is reduced with
``np.unique`` (C-level on fixed-width unicode arrays) and combined
with the k-bounded state via one more unique + bincount; the only
per-element Python is serialization over <= k survivors.

Reference parity note: the reference repo (C Q-Digest) has no
frequent-items sketch; this family is a north_rule addition in the
same mergeable-UDAF contract as qcore.c's merge (qcore.c:254-306) —
associative, commutative at the guarantee level, serialized through
the shuffle as opaque bytes.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBIqqI")  # magic, ver, k, n, err, n_keys
_MAGIC = b"MGS1"


class MisraGries:
    __slots__ = ("k", "keys", "counts", "n", "err")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = np.empty(0, dtype="U1")
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0
        self.err = 0

    # -- update ---------------------------------------------------------

    def update_batch(self, values, weights=None) -> None:
        """Fold a batch of string keys (optionally weighted — the
        JVM-precount plan hands us (key, count) histogram rows)."""
        vals = np.asarray(values)
        if vals.dtype == object or vals.dtype.kind not in ("U", "S"):
            vals = vals.astype("U")
        if len(vals) == 0:
            return
        if weights is None:
            uk, uc = np.unique(vals, return_counts=True)
            uc = uc.astype(np.int64)
            self.n += len(vals)
        else:
            w = np.asarray(weights, dtype=np.int64)
            uk, inv = np.unique(vals, return_inverse=True)
            # int64 scatter-add (np.bincount's float64 weights would
            # silently lose exactness above 2^53)
            uc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(uc, inv, w)
            self.n += int(w.sum())
        self._combine(uk, uc)

    def _combine(self, keys: np.ndarray, counts: np.ndarray) -> None:
        if len(self.keys):
            # '<U' widths may differ; np.concatenate promotes to the max
            keys = np.concatenate([self.keys, keys])
            counts = np.concatenate([self.counts, counts]).astype(np.int64)
            uk, inv = np.unique(keys, return_inverse=True)
            uc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(uc, inv, counts)
        else:
            uk, uc = keys, counts
        if len(uk) > self.k:
            # m = (k+1)-th largest count; survivors are counts > m
            m = int(np.partition(uc, len(uc) - (self.k + 1))[len(uc) - (self.k + 1)])
            keep = uc > m
            uk, uc = uk[keep], uc[keep] - m
            self.err += m
        self.keys, self.counts = uk, uc

    # -- query ----------------------------------------------------------

    def estimate(self, key: str) -> int:
        """Lower-bound count for ``key`` (0 if not tracked).
        true count is in [estimate, estimate + self.err]."""
        i = np.searchsorted(self.keys, key)
        if i < len(self.keys) and self.keys[i] == key:
            return int(self.counts[i])
        return 0

    def items(self) -> dict:
        return {str(k): int(c) for k, c in zip(self.keys, self.counts)}

    def error_bound(self) -> int:
        """Actual cumulative decrement (<= worst case n // (k+1))."""
        return int(self.err)

    def heavy_hitters(self, phi: float) -> dict:
        """Items whose TRUE count may exceed phi * n: everything with
        estimate + err > phi * n. Complete by the MG guarantee (no
        false negatives); estimates are lower bounds."""
        thr = phi * self.n
        out = {}
        for k, c in zip(self.keys, self.counts):
            if c + self.err > thr:
                out[str(k)] = int(c)
        return out

    # -- merge (Agarwal et al. 2012 §3) ----------------------------------

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("MisraGries k mismatch")
        self.n += other.n
        self.err += other.err
        if len(other.keys):
            self._combine(other.keys, other.counts.copy())
        return self

    # -- serialization ----------------------------------------------------

    def to_bytes(self) -> bytes:
        blobs = [str(k).encode("utf-8") for k in self.keys]
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int32,
                           count=len(blobs))
        return b"".join(
            [
                _HDR.pack(_MAGIC, 1, self.k, self.n, self.err, len(blobs)),
                self.counts.tobytes(),
                lens.tobytes(),
                b"".join(blobs),
            ]
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        magic, ver, k, n, err, nk = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad MisraGries buffer")
        sk = cls(k)
        sk.n, sk.err = n, err
        off = _HDR.size
        sk.counts = np.frombuffer(buf, dtype=np.int64, count=nk, offset=off).copy()
        off += 8 * nk
        lens = np.frombuffer(buf, dtype=np.int32, count=nk, offset=off)
        off += 4 * nk
        keys = []
        for ln in lens:
            keys.append(buf[off:off + ln].decode("utf-8"))
            off += int(ln)
        sk.keys = np.asarray(keys, dtype="U") if keys else np.empty(0, dtype="U1")
        # np.unique order (sorted) is the invariant searchsorted relies on;
        # serialization preserves it, but normalize defensively
        order = np.argsort(sk.keys)
        sk.keys, sk.counts = sk.keys[order], sk.counts[order]
        return sk

    def __repr__(self) -> str:
        return f"MisraGries(k={self.k}, tracked={len(self.keys)}, n={self.n}, err={self.err})"
