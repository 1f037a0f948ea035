"""Bloom filter (membership), double-hashing scheme of Kirsch &
Mitzenmacher 2006: h_i = h1 + i * h2 (mod m).

No counterpart in the reference repo; included per BASELINE.json
north_rule (membership queries). Bit array as packed uint64 words.
Guarantees: zero false negatives; FPR ~= (1 - exp(-k n / m)) ** k.
Merge = bitwise OR (same (m, k) required).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import rehash

_HDR = struct.Struct("<4sBBqq")  # magic, ver, k, m_bits, n_added
_MAGIC = b"BLM1"


def optimal_params(expected_n: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate."""
    m = int(np.ceil(-expected_n * np.log(fpr) / (np.log(2) ** 2)))
    m = max(64, 1 << int(np.ceil(np.log2(m))))  # round up to pow2 words-friendly
    k = max(1, int(round(m / expected_n * np.log(2))))
    return m, k


class Bloom:
    __slots__ = ("m_bits", "k", "words", "n_added")

    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.words = np.zeros(self.m_bits // 64, dtype=np.uint64)
        self.n_added = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        h1 = rehash(h, 0xB100)
        h2 = rehash(h, 0xB200) | np.uint64(1)  # odd -> full-period stride
        m = np.uint64(self.m_bits)
        with np.errstate(over="ignore"):
            return np.stack([(h1 + np.uint64(i) * h2) % m for i in range(self.k)])

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n_added += len(hashes)

    def update_batch(self, values) -> None:
        from .hashing import hash_any

        self.add_hashes(hash_any(values))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(hashes)  # (k, n)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.words[word] & bit) != 0
        return hit.all(axis=0)

    def contains(self, values) -> np.ndarray:
        from .hashing import hash_any

        return self.contains_hashes(hash_any(values))

    def merge(self, other: "Bloom") -> "Bloom":
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("Bloom shape mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def fpr(self) -> float:
        load = self.k * self.n_added / self.m_bits
        return float((1 - np.exp(-load)) ** self.k)

    def to_bytes(self) -> bytes:
        return _HDR.pack(_MAGIC, 1, self.k, self.m_bits, self.n_added) + self.words.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Bloom":
        magic, ver, k, m_bits, n_added = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad Bloom buffer")
        sk = cls(m_bits, k)
        sk.n_added = n_added
        sk.words = np.frombuffer(buf, dtype=np.uint64, count=m_bits // 64, offset=_HDR.size).copy()
        return sk

    def __repr__(self) -> str:
        return f"Bloom(m={self.m_bits}, k={self.k}, n={self.n_added}, fpr~{self.fpr():.2e})"
