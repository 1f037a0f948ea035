"""Priority sampling: a mergeable fixed-size weighted sample that
answers ARBITRARY subset-sum queries with near-optimal variance
(Duffield, Lund, Thorup, "Priority sampling for estimation of
arbitrary subset sums", JACM 54(6), 2007 — public algorithm).

No counterpart in the reference repo (its driver only synthesizes
uniform ints, serial-implementation/src/test.c:150-161); included
because a training-data pipeline constantly needs "how many tokens /
bytes does slice X contribute?" answered from one small sample that
was drawn BEFORE the slice predicate was known. A-ES weighted
sampling (operators/sampling.weighted_sample) draws representative
rows; priority sampling additionally carries an unbiased ESTIMATOR:

- each item i gets priority q_i = w_i / u_i with u_i uniform(0,1]
- retain the k+1 largest priorities; tau = the (k+1)-th largest
- for any subset T:  Sum_{i in top-k, i in T} max(w_i, tau) is an
  unbiased estimate of Sum_{i in T} w_i  (DLT Theorem 1), and with
  k+1 retained entries no other sampling scheme beats its variance
  by more than one sample (Szegedy 2006).

Determinism / engine portability: u_i is hash-derived (splitmix64 of
the key, top 32 bits; u = (h+1)/2^32 in (0,1]), and the whole
computation is kept in INTEGER space — the priority
p_i = floor(w_i * 2^32 / (h_i + 1)) EQUALS floor(w_i / u_i), so it is
already in weight units and the estimator needs no rescaling. Merge
order, task retries, and re-partitioning can never flip a rank, and
an ANSI-SQL engine reproduces the identical sample and estimate (see
__spark_entry__.priority_sample_subsetsum, which uses the md5-derived
variant of the same integer contract from operators/sampling.py).
Floor-quantizing the priority perturbs tau by < 1 weight unit
relative to the real-valued DLT threshold; the estimator stays
unbiased over the hash family to that resolution.

State is the (k+1)-entry top list itself, so merge (concat, dedup,
re-top) is associative, commutative, and idempotent — bit-identical
state regardless of merge order, asserted in tests. tau is derived,
not stored: 0 while <= k distinct items have been seen (estimates are
EXACT in that regime), else the smallest retained priority.

Weight domain: integer 1 <= w < 2^31 (so w * 2^32 fits int64 and the
scaled estimate of a k-sample stays < 2^63). Keys are treated as
strings and must be unique per logical item (a keyed table); feeding
the same key twice keeps the first-seen weight.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import hash_strings, rehash

_HDR = struct.Struct("<4sIQI")  # magic, k, seed, n_entries
_MAGIC = b"PRI1"
_SCALE = 1 << 32


class PrioritySample:
    __slots__ = ("k", "seed", "prio", "weights", "keys")

    def __init__(self, k: int = 64, seed: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.prio = np.empty(0, dtype=np.int64)
        self.weights = np.empty(0, dtype=np.int64)
        self.keys = np.empty(0, dtype=object)

    # ------------------------------------------------------------ update
    def _retop(self, prio, weights, keys) -> None:
        """Keep the k+1 largest by (priority desc, key asc), first
        occurrence per key. Vectorized: one lexsort + one duplicate
        scan, no per-row Python."""
        order = np.lexsort((keys, -prio))
        prio, weights, keys = prio[order], weights[order], keys[order]
        if len(keys) > 1:
            # keys arrive sorted within each priority run, not globally;
            # pandas-free dedup: mark the first occurrence via argsort of
            # keys (stable), then keep original order
            import pandas as pd

            dup = pd.Series(keys).duplicated().to_numpy()
            if dup.any():
                keep = ~dup
                prio, weights, keys = prio[keep], weights[keep], keys[keep]
        n = min(len(keys), self.k + 1)
        self.prio, self.weights, self.keys = prio[:n], weights[:n], keys[:n]

    def update_batch(self, keys, weights) -> "PrioritySample":
        karr = np.asarray(keys, dtype=object)
        w = np.asarray(weights)
        if len(karr) != len(w):
            raise ValueError("keys and weights must align")
        if len(karr) == 0:
            return self
        w = w.astype(np.int64)
        if (w <= 0).any() or (w >= (1 << 31)).any():
            raise ValueError("weights must be integers in [1, 2^31)")
        skeys = np.array([str(x) for x in karr], dtype=object)
        h = hash_strings(skeys)
        if self.seed:
            h = rehash(h, self.seed)
        h32 = (h >> np.uint64(32)).astype(np.int64) + 1  # in [1, 2^32]
        p = (w * np.int64(_SCALE)) // h32
        self._retop(
            np.concatenate([self.prio, p]),
            np.concatenate([self.weights, w]),
            np.concatenate([self.keys, skeys]),
        )
        return self

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("can only merge samples with equal (k, seed)")
        self._retop(
            np.concatenate([self.prio, other.prio]),
            np.concatenate([self.weights, other.weights]),
            np.concatenate([self.keys, other.keys]),
        )
        return self

    # ------------------------------------------------------------ query
    @property
    def tau(self) -> int:
        """Integer threshold in WEIGHT units (p = floor(w/u)): 0 while
        <= k items retained (exact regime — estimates are exact sums),
        else the (k+1)-th largest priority."""
        return 0 if len(self.prio) <= self.k else int(self.prio[-1])

    def sample(self) -> list[tuple[str, int]]:
        """The k retained (key, weight) pairs (all of them in the
        exact regime)."""
        n = min(len(self.keys), self.k)
        return [(str(k), int(w)) for k, w in zip(self.keys[:n], self.weights[:n])]

    def _est(self, mask: np.ndarray) -> int:
        # Python-int accumulation: tau can be as large as w * 2^32, so
        # k * tau may exceed int64; k terms at the driver — cold path.
        n = min(len(self.keys), self.k)
        t = self.tau
        return sum(
            max(int(w), t)
            for w, m in zip(self.weights[:n], mask[:n])
            if m
        )

    def estimate_total(self) -> int:
        """Unbiased estimate of the total weight (DLT Theorem 1)."""
        n = min(len(self.keys), self.k)
        return self._est(np.ones(n, dtype=bool))

    def subset_sum(self, members) -> int:
        """Unbiased estimate of sum(w_i for i in members); `members`
        is any container of keys (stringified to match update keys)."""
        ms = {str(m) for m in members}
        n = min(len(self.keys), self.k)
        mask = np.fromiter((k in ms for k in self.keys[:n]), dtype=bool, count=n)
        return self._est(mask)

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        kb = [str(x).encode("utf-8") for x in self.keys]
        lens = np.fromiter((len(b) for b in kb), dtype=np.int32, count=len(kb))
        return b"".join(
            [
                _HDR.pack(_MAGIC, self.k, self.seed, len(self.keys)),
                self.prio.astype("<i8").tobytes(),
                self.weights.astype("<i8").tobytes(),
                lens.astype("<i4").tobytes(),
                b"".join(kb),
            ]
        )

    @staticmethod
    def from_bytes(buf: bytes) -> "PrioritySample":
        magic, k, seed, n = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC:
            raise ValueError("not a PrioritySample buffer")
        s = PrioritySample(k, seed)
        off = _HDR.size
        s.prio = np.frombuffer(buf, dtype="<i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        s.weights = np.frombuffer(buf, dtype="<i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        lens = np.frombuffer(buf, dtype="<i4", count=n, offset=off)
        off += 4 * n
        keys = []
        for ln in lens:
            keys.append(buf[off : off + ln].decode("utf-8"))
            off += int(ln)
        s.keys = np.array(keys, dtype=object)
        return s

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"PrioritySample(k={self.k}, entries={len(self.keys)}, "
            f"tau={self.tau})"
        )


def prioritysample_from_bytes(buf: bytes) -> PrioritySample:
    return PrioritySample.from_bytes(buf)
