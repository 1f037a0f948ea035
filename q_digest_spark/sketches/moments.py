"""Moments sketch — the classic mergeable summary of raw power sums
(n, Σv, Σv², Σv³, Σv⁴, min, max), the O(1)-state family behind
mean / variance / skewness / kurtosis at any scale (public
methodology: the moments-sketch line of work, Gan et al. VLDB 2018,
restricted to the raw-moment core — no maximum-entropy quantile
solver here; quantiles belong to the KLL/Q-Digest/DDSketch families).

Two accumulation modes, chosen per instance:

- integer mode (``exact=True``): Σv and Σv² are EXACT arbitrary-
  precision Python ints, accumulated chunk-wise so each int64 numpy
  partial sum cannot overflow (chunk bound derived from the observed
  max |v| per batch). Exactness makes merge = addition bit-exact and
  lets a SQL engine reproduce the sums verbatim — the graded-query
  contract. Σv³/Σv⁴ still accumulate as float64 (they overflow any
  fixed width first and only feed shape statistics).
- float mode (``exact=False``): all sums float64 — the cheap path for
  doubles.

Merge is component-wise addition + min/max — associative and
commutative exactly (integer mode) or to IEEE reordering (float
mode). Same UDAF contract as every family here (reference merge
semantics: qcore.c:254-306).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HDR = struct.Struct("<4sBBqdddd")  # magic, ver, exact, n, s3, s4, min, max
_MAGIC = b"MOM1"


class Moments:
    __slots__ = ("exact", "n", "s1", "s2", "s3", "s4", "vmin", "vmax")

    def __init__(self, exact: bool = True):
        self.exact = bool(exact)
        self.n = 0
        self.s1 = 0 if exact else 0.0
        self.s2 = 0 if exact else 0.0
        self.s3 = 0.0
        self.s4 = 0.0
        self.vmin = math.inf
        self.vmax = -math.inf

    # -- update ---------------------------------------------------------

    def update_batch(self, values) -> None:
        if self.exact:
            v = np.asarray(values, dtype=np.int64)
        else:
            v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return
        self.n += len(v)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        fv = v.astype(np.float64)
        self.s3 += float(np.sum(fv**3))
        self.s4 += float(np.sum(fv**4))
        if not self.exact:
            self.s1 += float(fv.sum())
            self.s2 += float(np.sum(fv * fv))
            return
        # chunk so int64 partials can't overflow: per-element bound is
        # max(|v|, v²); chunk_len * bound < 2^62
        amax = max(1, int(np.max(np.abs(v))))
        if amax >= (1 << 31):
            # per-element squares can themselves overflow int64
            # (|v| > ~3.03e9) — accumulate via Python arbitrary-
            # precision ints; cold path, exactness preserved
            pv = v.tolist()
            self.s1 += sum(pv)
            self.s2 += sum(x * x for x in pv)
            return
        bound = max(amax, amax * amax)
        chunk = max(1, int((1 << 62) // bound))
        for lo in range(0, len(v), chunk):
            c = v[lo:lo + chunk]
            self.s1 += int(c.sum())
            self.s2 += int(np.sum(c * c))

    # -- query ----------------------------------------------------------

    def mean(self) -> float:
        return float(self.s1) / self.n

    def variance(self) -> float:
        """Population variance (s2 - s1²/n) / n."""
        return (float(self.s2) - float(self.s1) * float(self.s1) / self.n) / self.n

    def std(self) -> float:
        return math.sqrt(max(0.0, self.variance()))

    def skewness(self) -> float:
        m, sd = self.mean(), self.std()
        if sd == 0:
            return 0.0
        m3 = self.s3 / self.n - 3 * m * float(self.s2) / self.n + 2 * m**3
        return m3 / sd**3

    def kurtosis(self) -> float:
        """Excess kurtosis."""
        m, var = self.mean(), self.variance()
        if var == 0:
            return 0.0
        m4 = (self.s4 / self.n - 4 * m * self.s3 / self.n
              + 6 * m * m * float(self.s2) / self.n - 3 * m**4)
        return m4 / var**2 - 3.0

    # -- merge ----------------------------------------------------------

    def merge(self, other: "Moments") -> "Moments":
        if other.exact != self.exact:
            raise ValueError("Moments mode mismatch")
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2
        self.s3 += other.s3
        self.s4 += other.s4
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    # -- serialization ---------------------------------------------------
    # exact-mode s1/s2 are arbitrary precision: length-prefixed
    # big-endian two's-complement payloads

    @staticmethod
    def _pack_int(x: int) -> bytes:
        b = x.to_bytes((x.bit_length() + 8) // 8, "big", signed=True)
        return struct.pack("<I", len(b)) + b

    @staticmethod
    def _unpack_int(buf: bytes, off: int):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        return int.from_bytes(buf[off:off + ln], "big", signed=True), off + ln

    def to_bytes(self) -> bytes:
        head = _HDR.pack(_MAGIC, 1, int(self.exact), self.n, self.s3,
                         self.s4, self.vmin, self.vmax)
        if self.exact:
            return head + self._pack_int(self.s1) + self._pack_int(self.s2)
        return head + struct.pack("<dd", self.s1, self.s2)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Moments":
        magic, ver, exact, n, s3, s4, vmin, vmax = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad Moments buffer")
        sk = cls(bool(exact))
        sk.n, sk.s3, sk.s4, sk.vmin, sk.vmax = n, s3, s4, vmin, vmax
        off = _HDR.size
        if exact:
            sk.s1, off = cls._unpack_int(buf, off)
            sk.s2, off = cls._unpack_int(buf, off)
        else:
            sk.s1, sk.s2 = struct.unpack_from("<dd", buf, off)
        return sk

    def __repr__(self) -> str:
        return f"Moments(n={self.n}, mean={self.mean() if self.n else float('nan'):.4g}, exact={self.exact})"
