"""Lossy Counting (Manku & Motwani, VLDB 2002: "Approximate frequency
counts over data streams"), in the mergeable batch formulation a
distributed engine needs.

State: entries (key, f, delta) plus the stream length n, for a fixed
error parameter eps. The classic invariant — maintained here across
batch folds AND merges — is

  f(x) <= true(x) <= f(x) + delta(x),   delta(x) <= floor(eps * n),

so every key with true(x) > eps*n is guaranteed present (its
f + delta >= true > eps*n survives every prune), estimates are
UNDERCOUNTS (the mirror image of Count-Min), and the summary holds
O((1/eps) * log(eps * n)) entries on any input (Manku-Motwani Thm 4.2;
the batch variant can only prune more lazily by at most one batch).

Batch fold (histogram in, one numpy pass): present keys add their
batch counts to f; NEW keys enter with delta = floor(eps * n_before)
— every occurrence they may have lost was pruned earlier, and a prune
only discards entries with f + delta <= floor(eps * n_at_prune)
<= floor(eps * n_before), so the invariant holds inductively. After
the fold, prune f + delta <= floor(eps * n_now).

Merge of summaries over DISJOINT sub-streams (the shuffle contract):
for each key, f = f1 + f2 (0 when absent) and
delta = delta1' + delta2', where delta_i' = delta_i when present and
floor(eps * n_i) when absent — an absent key's entire count in
sub-stream i was pruned there, hence <= floor(eps * n_i) by the same
invariant. Then prune at floor(eps * (n1 + n2)). Associative and
commutative at the guarantee level (the permutation test pins it).

Everything is numpy over sorted unicode key arrays (same discipline as
sketches/misragries.py); no per-row Python anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBdqI")  # magic, ver, eps, n, n_keys
_MAGIC = b"LCS1"


class LossyCounting:
    __slots__ = ("eps", "keys", "f", "delta", "n")

    def __init__(self, eps: float = 0.001):
        if not (0 < eps < 1):
            raise ValueError("eps must be in (0, 1)")
        self.eps = float(eps)
        self.keys = np.empty(0, dtype="U1")
        self.f = np.empty(0, dtype=np.int64)
        self.delta = np.empty(0, dtype=np.int64)
        self.n = 0

    # -- update ---------------------------------------------------------

    def update_batch(self, values, weights=None) -> None:
        vals = np.asarray(values)
        if vals.dtype == object or vals.dtype.kind not in ("U", "S"):
            vals = vals.astype("U")
        if len(vals) == 0:
            return
        if weights is None:
            uk, uc = np.unique(vals, return_counts=True)
            uc = uc.astype(np.int64)
            batch_n = len(vals)
        else:
            w = np.asarray(weights, dtype=np.int64)
            uk, inv = np.unique(vals, return_inverse=True)
            uc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(uc, inv, w)
            batch_n = int(w.sum())
        new_delta = int(self.eps * self.n)  # floor(eps * n_before)
        self._combine(uk, uc, np.full(len(uk), new_delta, dtype=np.int64),
                      add_n=batch_n)

    def _combine(self, keys, counts, deltas, add_n: int) -> None:
        """Union-fold (keys, f+=counts, delta for NEW keys only) then
        prune at the new floor(eps*n). ``deltas`` carries the delta a
        key would get if it is NOT already tracked; tracked keys keep
        their existing (smaller or equal) delta."""
        if len(self.keys):
            allk = np.concatenate([self.keys, keys])
            uk, inv = np.unique(allk, return_inverse=True)
            f = np.zeros(len(uk), dtype=np.int64)
            np.add.at(f, inv, np.concatenate([self.f, counts]).astype(np.int64))
            # delta: min over contributions — an existing entry's delta
            # beats (<=) the new-key delta; for merge both sides carry
            # real deltas and absent sides contribute their eps*n_i cap,
            # summed below by the caller passing pre-summed deltas.
            d = np.full(len(uk), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(
                d, inv, np.concatenate([self.delta, deltas]).astype(np.int64)
            )
        else:
            uk, f, d = keys, counts.astype(np.int64), deltas.astype(np.int64)
        self.n += add_n
        thr = int(self.eps * self.n)
        keep = f + d > thr
        self.keys, self.f, self.delta = uk[keep], f[keep], d[keep]

    # -- query ----------------------------------------------------------

    def estimate(self, key: str) -> int:
        """Lower bound f(x); 0 if pruned. true in [f, f + delta]."""
        i = np.searchsorted(self.keys, key)
        if i < len(self.keys) and self.keys[i] == key:
            return int(self.f[i])
        return 0

    def delta_of(self, key: str) -> int:
        """Undercount cap for ``key`` (floor(eps*n) if untracked)."""
        i = np.searchsorted(self.keys, key)
        if i < len(self.keys) and self.keys[i] == key:
            return int(self.delta[i])
        return int(self.eps * self.n)

    def items(self) -> dict:
        return {str(k): int(c) for k, c in zip(self.keys, self.f)}

    def frequent(self, s: float) -> dict:
        """Manku-Motwani output rule: keys with f >= (s - eps) * n.
        Contains every key with true > s*n; no key with
        true < (s - eps) * n."""
        thr = (s - self.eps) * self.n
        return {str(k): int(c) for k, c in zip(self.keys, self.f) if c >= thr}

    # -- merge ----------------------------------------------------------

    def merge(self, other: "LossyCounting") -> "LossyCounting":
        if abs(other.eps - self.eps) > 1e-12:
            raise ValueError("LossyCounting eps mismatch")
        cap_self = int(self.eps * self.n)
        cap_other = int(other.eps * other.n)
        allk = np.concatenate([self.keys, other.keys])
        if len(allk) == 0:
            self.n += other.n
            return self
        uk, inv = np.unique(allk, return_inverse=True)
        f = np.zeros(len(uk), dtype=np.int64)
        np.add.at(f, inv, np.concatenate([self.f, other.f]).astype(np.int64))
        # delta = (delta_or_cap from self) + (delta_or_cap from other):
        # start both sides at their absent-key cap, overwrite where present
        d_self = np.full(len(uk), cap_self, dtype=np.int64)
        d_other = np.full(len(uk), cap_other, dtype=np.int64)
        if len(self.keys):
            pos = np.searchsorted(uk, self.keys)
            d_self[pos] = self.delta
        if len(other.keys):
            pos = np.searchsorted(uk, other.keys)
            d_other[pos] = other.delta
        d = d_self + d_other
        self.n += other.n
        thr = int(self.eps * self.n)
        keep = f + d > thr
        self.keys, self.f, self.delta = uk[keep], f[keep], d[keep]
        return self

    # -- serialization ----------------------------------------------------

    def to_bytes(self) -> bytes:
        blobs = [str(k).encode("utf-8") for k in self.keys]
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int32,
                           count=len(blobs))
        return b"".join(
            [
                _HDR.pack(_MAGIC, 1, self.eps, self.n, len(blobs)),
                self.f.tobytes(),
                self.delta.tobytes(),
                lens.tobytes(),
                b"".join(blobs),
            ]
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "LossyCounting":
        magic, ver, eps, n, nk = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad LossyCounting buffer")
        sk = cls(eps)
        sk.n = n
        off = _HDR.size
        sk.f = np.frombuffer(buf, dtype=np.int64, count=nk, offset=off).copy()
        off += 8 * nk
        sk.delta = np.frombuffer(buf, dtype=np.int64, count=nk, offset=off).copy()
        off += 8 * nk
        lens = np.frombuffer(buf, dtype=np.int32, count=nk, offset=off)
        off += 4 * nk
        keys = []
        for ln in lens:
            keys.append(buf[off:off + ln].decode("utf-8"))
            off += int(ln)
        sk.keys = np.asarray(keys, dtype="U") if keys else np.empty(0, dtype="U1")
        order = np.argsort(sk.keys)
        sk.keys, sk.f, sk.delta = sk.keys[order], sk.f[order], sk.delta[order]
        return sk

    def __repr__(self) -> str:
        return (f"LossyCounting(eps={self.eps}, tracked={len(self.keys)}, "
                f"n={self.n})")
