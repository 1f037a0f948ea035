"""Frequent Directions matrix sketch (Liberty, KDD 2013; Ghashami,
Liberty, Phillips & Woodruff 2016) — the matrix analog of Misra-Gries:
a small ell x d matrix B whose Gram product B^T B approximates the
full data Gram A^T A, the one-pass summary behind streaming PCA /
covariance estimation over an embedding column at corpus scale.

Algorithm (GLPW16 pseudocode): keep an ell-row buffer; when it fills,
SVD it, subtract sigma_{ell/2}^2 from every squared singular value
(clamping at 0), and rebuild B = sigma' V^T — at least half the rows
become zero, making room. Deterministic, no randomness anywhere.

Guarantees, both tracked by the sketch:
- 0 <= x^T (A^T A - B^T B) x <= delta_sum * ||x||^2 for every x, where
  ``delta_sum`` is the sum of the shrinkage values actually applied
  (the tight, data-dependent certificate), and
- delta_sum <= 2 * ||A||_F^2 / ell (the worst-case bound; ||A||_F^2 is
  accumulated exactly alongside).

MERGE: feed the other sketch's nonzero rows through the same insert
path and add the (delta_sum, frob2, n) accounting — GLPW16 Thm 3.1
proves the bound is preserved under arbitrary merge trees, which is
exactly the two-level partial->tree_merge contract every family here
uses (reference merge semantics: qcore.c:254-306).

Updates are vectorized: a whole Arrow batch of rows is np.stack-ed
and block-inserted; SVD cost is O(ell^2 d) per compaction, amortized
O(ell d) per row.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBHHqdd")  # magic, ver, ell, d, n, delta_sum, frob2
_MAGIC = b"FDS1"


class FrequentDirections:
    __slots__ = ("ell", "d", "B", "_filled", "n", "delta_sum", "frob2")

    def __init__(self, ell: int = 32, d: int | None = None):
        if ell < 2 or ell % 2:
            raise ValueError("ell must be even and >= 2")
        self.ell = int(ell)
        self.d = None if d is None else int(d)
        self.B = None if d is None else np.zeros((self.ell, int(d)))
        self._filled = 0
        self.n = 0
        self.delta_sum = 0.0
        self.frob2 = 0.0

    # -- update ----------------------------------------------------------

    def _ensure(self, d: int) -> None:
        if self.d is None:
            self.d = int(d)
            self.B = np.zeros((self.ell, self.d))
        elif d != self.d:
            raise ValueError(f"dimension mismatch: {d} != {self.d}")

    def _compact(self) -> None:
        # SVD-shrink: zero out at least the bottom half of the rows.
        _, s, vt = np.linalg.svd(self.B[: self._filled], full_matrices=False)
        delta = float(s[min(self.ell // 2, len(s)) - 1] ** 2) if len(s) else 0.0
        s2 = np.maximum(s * s - delta, 0.0)
        keep = int(np.count_nonzero(s2))
        self.B[:] = 0.0
        if keep:
            self.B[:keep] = np.sqrt(s2[:keep])[:, None] * vt[:keep]
        self._filled = keep
        self.delta_sum += delta

    def _insert_rows(self, rows: np.ndarray) -> None:
        i = 0
        while i < len(rows):
            room = self.ell - self._filled
            if room == 0:
                self._compact()
                room = self.ell - self._filled
            take = min(room, len(rows) - i)
            self.B[self._filled:self._filled + take] = rows[i:i + take]
            self._filled += take
            i += take

    def update_batch(self, values) -> None:
        """values: iterable of length-d vectors (an Arrow object array
        of lists/arrays, or a 2-D numpy array)."""
        if isinstance(values, np.ndarray) and values.ndim == 2:
            rows = np.asarray(values, dtype=np.float64)
        else:
            lst = list(values)
            if not lst:
                return
            rows = np.stack([np.asarray(v, dtype=np.float64) for v in lst])
        if len(rows) == 0:
            return
        self._ensure(rows.shape[1])
        self.n += len(rows)
        self.frob2 += float(np.sum(rows * rows))
        self._insert_rows(rows)

    # -- query -----------------------------------------------------------

    def gram(self) -> np.ndarray:
        """B^T B — the d x d approximation of A^T A."""
        if self.B is None:
            raise ValueError("empty sketch")
        b = self.B[: self._filled]
        return b.T @ b

    def cert_bound(self) -> float:
        """The data-dependent certificate: ||A^T A - B^T B||_2 <=
        delta_sum (exactly the shrinkage mass applied so far)."""
        return float(self.delta_sum)

    def worst_case_bound(self) -> float:
        """The a-priori FD guarantee 2 * ||A||_F^2 / ell."""
        return 2.0 * self.frob2 / self.ell

    # -- merge -----------------------------------------------------------

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.ell != self.ell:
            raise ValueError("FrequentDirections ell mismatch")
        if other.d is not None:
            self._ensure(other.d)
            if other._filled:
                self._insert_rows(other.B[: other._filled])
        self.n += other.n
        self.delta_sum += other.delta_sum
        self.frob2 += other.frob2
        return self

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        d = self.d or 0
        head = _HDR.pack(_MAGIC, 1, self.ell, d, self.n, self.delta_sum, self.frob2)
        if self.d is None or self._filled == 0:
            return head + struct.pack("<H", 0)
        rows = np.ascontiguousarray(self.B[: self._filled], dtype=np.float64)
        return head + struct.pack("<H", self._filled) + rows.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentDirections":
        magic, ver, ell, d, n, delta_sum, frob2 = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad FrequentDirections buffer")
        sk = cls(ell, d if d else None)
        sk.n, sk.delta_sum, sk.frob2 = n, delta_sum, frob2
        off = _HDR.size
        (filled,) = struct.unpack_from("<H", buf, off)
        off += 2
        if filled:
            sk.B[:filled] = (
                np.frombuffer(buf, dtype=np.float64, count=filled * d, offset=off)
                .reshape(filled, d)
            )
            sk._filled = filled
        return sk

    def __repr__(self) -> str:
        return (f"FrequentDirections(ell={self.ell}, d={self.d}, n={self.n}, "
                f"cert={self.delta_sum:.4g})")
