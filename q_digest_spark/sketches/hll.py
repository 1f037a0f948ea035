"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
HLL++ small-range linear-counting correction of Heule et al. 2013).

No counterpart in the reference repo; included per BASELINE.json
north_rule (distinct-url counting). 64-bit input hashes, dense
2**p uint8 register array.

Standard error = 1.04 / sqrt(2**p); p=14 (16 KiB state) -> 0.81%.
Merge = elementwise register max (associative, commutative,
idempotent).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import bit_length_u64

_HDR = struct.Struct("<4sBB")
_MAGIC = b"HLL1"


class HLL:
    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Consume pre-computed 64-bit hashes (vectorized)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = position of leftmost 1-bit in the remaining 64-p bits
        rho = (64 - self.p) - bit_length_u64(rest) + 1
        np.maximum.at(self.regs, idx, rho.astype(np.uint8))

    def update_batch(self, values) -> None:
        from .hashing import hash_any

        self.update_hashes(hash_any(values))

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError("HLL precision mismatch")
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = self.m
        if m == 16384:
            alpha = 0.7213 / (1 + 1.079 / m)
        elif m >= 128:
            alpha = 0.7213 / (1 + 1.079 / m)
        elif m == 64:
            alpha = 0.709
        elif m == 32:
            alpha = 0.697
        else:
            alpha = 0.673
        inv = np.ldexp(1.0, -self.regs.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.regs == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def rel_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return _HDR.pack(_MAGIC, 1, self.p) + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HLL":
        magic, ver, p = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad HLL buffer")
        sk = cls(p)
        sk.regs = np.frombuffer(buf, dtype=np.uint8, count=sk.m, offset=_HDR.size).copy()
        return sk

    def __repr__(self) -> str:
        return f"HLL(p={self.p}, est={self.estimate():.1f})"
