"""Counting Bloom filter — the deletable Bloom (Fan, Cao, Almeida,
Broder, "Summary Cache: A Scalable Wide-Area Web Cache Sharing
Protocol", IEEE/ACM ToN 2000 — public literature).

Each of the k positions holds a COUNTER instead of a bit: insert is
+1 on k positions, delete is -1, membership is "all k counters > 0".
Deletes of items actually inserted (multiset discipline: never delete
more times than inserted) preserve the zero-false-negative guarantee
for everything still present; false positives follow the plain Bloom
rate with n = net items.

Signed, mergeable design (what makes it a distributed sketch rather
than a mutable data structure): ``update_batch(values, weights)``
accepts NEGATIVE weights, so the insert stream (+1) and the delete
stream (-1) are just two inputs to the same associative aggregation —
merge is elementwise counter ADDITION, exact, commutative, and
order-free. A partial that has seen only deletes carries negative
counters; they cancel exactly against the matching inserts during the
merge (membership is only meaningful on the fully merged filter).
This is how deletion distributes at 100 TB: no read-modify-write on a
shared filter, just one more partial-sketch stream through the
standard two-level contract (operators/aggregate.py).

Counters are int64 — production filters use 4-bit saturating counters
to save memory; here the merge algebra must stay exact under signed
partial merges in any order, and the filter ships once per partition,
so 8 bytes/slot is the right trade. Hash scheme shared with bloom.py:
Kirsch-Mitzenmacher double hashing h_i = h1 + i*h2 (mod m).

No counterpart in the reference repo; north_rule membership-query
family (the deletable complement to bloom.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import rehash

_HDR = struct.Struct("<4sBBqqq")  # magic, ver, k, m_slots, n_pos, n_neg
_MAGIC = b"CBF1"


class CountingBloom:
    __slots__ = ("m_slots", "k", "counts", "n_pos", "n_neg")

    def __init__(self, m_slots: int = 1 << 17, k: int = 7):
        if m_slots < 64:
            raise ValueError("m_slots must be >= 64")
        self.m_slots = int(m_slots)
        self.k = int(k)
        self.counts = np.zeros(self.m_slots, dtype=np.int64)
        self.n_pos = 0  # total inserted multiplicity
        self.n_neg = 0  # total deleted multiplicity

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        h1 = rehash(h, 0xCB10)
        h2 = rehash(h, 0xCB20) | np.uint64(1)  # odd -> full-period stride
        m = np.uint64(self.m_slots)
        with np.errstate(over="ignore"):
            return np.stack([(h1 + np.uint64(i) * h2) % m for i in range(self.k)])

    def add_hashes(self, hashes: np.ndarray, weights=None) -> None:
        """weights: per-item signed int multiplicities (default +1).
        Vectorized int64 scatter-add — no per-row Python."""
        if len(hashes) == 0:
            return
        if weights is None:
            w = np.ones(len(hashes), dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        pos = self._positions(hashes)  # (k, n)
        np.add.at(self.counts, pos.ravel().astype(np.int64),
                  np.broadcast_to(w, pos.shape).ravel())
        self.n_pos += int(w[w > 0].sum())
        self.n_neg += int(-w[w < 0].sum())

    def update_batch(self, values, weights=None) -> None:
        from .hashing import hash_any

        self.add_hashes(hash_any(values), weights)

    def remove_batch(self, values) -> None:
        from .hashing import hash_any

        h = hash_any(values)
        self.add_hashes(h, np.full(len(h), -1, dtype=np.int64))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Membership on the FULLY MERGED filter (partials with
        outstanding unmatched deletes give no guarantee)."""
        if len(hashes) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(hashes)
        hit = self.counts[pos.astype(np.int64)] > 0
        return hit.all(axis=0)

    def contains(self, values) -> np.ndarray:
        from .hashing import hash_any

        return self.contains_hashes(hash_any(values))

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        if (other.m_slots, other.k) != (self.m_slots, self.k):
            raise ValueError("CountingBloom shape mismatch")
        np.add(self.counts, other.counts, out=self.counts)
        self.n_pos += other.n_pos
        self.n_neg += other.n_neg
        return self

    def fpr(self) -> float:
        """Plain-Bloom rate with n = net present multiplicity."""
        n_net = max(0, self.n_pos - self.n_neg)
        load = self.k * n_net / self.m_slots
        return float((1 - np.exp(-load)) ** self.k)

    def to_bytes(self) -> bytes:
        return (
            _HDR.pack(_MAGIC, 1, self.k, self.m_slots, self.n_pos, self.n_neg)
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountingBloom":
        magic, ver, k, m_slots, n_pos, n_neg = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad CountingBloom buffer")
        sk = cls(m_slots, k)
        sk.n_pos = n_pos
        sk.n_neg = n_neg
        sk.counts = np.frombuffer(
            buf, dtype=np.int64, count=m_slots, offset=_HDR.size
        ).copy()
        return sk

    def __repr__(self) -> str:
        return (
            f"CountingBloom(m={self.m_slots}, k={self.k}, "
            f"+{self.n_pos}/-{self.n_neg}, fpr~{self.fpr():.2e})"
        )
