"""Space-Saving top-k summary (Metwally, Agrawal & El Abbadi,
ICDT 2005: "Efficient computation of frequent and top-k elements in
data streams"), realized through its exact isomorphism to Misra-Gries
(Agarwal, Cormode, Huang, Phillips, Wei & Yi, PODS 2012 §3: an
m-counter Space-Saving summary and an (m-1)-counter Misra-Gries
summary over the same stream carry identical information — the
Space-Saving estimate is the MG estimate plus the cumulative MG
decrement, and the Space-Saving minimum counter equals that
decrement).

Why build it this way instead of re-implementing the stream-summary
eviction structure: the eviction loop is inherently item-at-a-time
(each insert may displace the current minimum), which is exactly the
per-row Python this engine bans in hot paths; the MG core already has
a vectorized batch fold and the PODS'12 merge. The isomorphism gives
the Space-Saving ESTIMATE SEMANTICS — an OVERESTIMATE, the mirror
image of MG's underestimate — with zero additional state:

  est_ss(x)  = est_mg(x) + err          (tracked x)
  est_ss(x)  = err                      (untracked x — the classic
                                         Space-Saving 'assume it holds
                                         the minimum counter' answer)
  guarantees:  true(x) <= est_ss(x) <= true(x) + err,
               err <= n / m  (m = number of counters),
  and every x with true(x) > n/m is tracked (no false negatives).

Merged summaries keep all three properties because the MG merge
(pointwise + (k+1)-th-largest decrement) keeps them; merge order is
irrelevant at the guarantee level (verified in tests alongside the
MG permutation suite).
"""

from __future__ import annotations

import struct

from .misragries import MisraGries

_HDR = struct.Struct("<4sBI")  # magic, ver, m
_MAGIC = b"SSV1"


class SpaceSaving:
    """m-counter Space-Saving summary (MG(m-1) core + err offset)."""

    __slots__ = ("m", "_mg")

    def __init__(self, m: int = 256):
        if m < 2:
            raise ValueError("m must be >= 2")
        self.m = int(m)
        self._mg = MisraGries(self.m - 1)

    # -- update ---------------------------------------------------------

    def update_batch(self, values, weights=None) -> None:
        self._mg.update_batch(values, weights)

    # -- query ----------------------------------------------------------

    @property
    def n(self) -> int:
        return self._mg.n

    def min_count(self) -> int:
        """The Space-Saving minimum counter == the MG decrement; the
        per-key overestimate is at most this, and it is <= n/m."""
        return int(self._mg.err)

    def estimate(self, key: str) -> int:
        """Overestimate: true(x) <= estimate(x) <= true(x) + min_count()."""
        return self._mg.estimate(key) + self._mg.err

    def is_tracked(self, key: str) -> bool:
        return self._mg.estimate(key) > 0

    def items(self) -> dict:
        """Tracked keys with their (over-)estimates."""
        return {k: c + self._mg.err for k, c in self._mg.items().items()}

    def topk(self, k: int) -> list[tuple[str, int]]:
        """Top-k tracked keys by overestimate, key-asc tie-break."""
        it = sorted(self.items().items(), key=lambda t: (-t[1], t[0]))
        return it[:k]

    # -- merge ----------------------------------------------------------

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if other.m != self.m:
            raise ValueError("SpaceSaving m mismatch")
        self._mg.merge(other._mg)
        return self

    # -- serialization ----------------------------------------------------

    def to_bytes(self) -> bytes:
        return _HDR.pack(_MAGIC, 1, self.m) + self._mg.to_bytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SpaceSaving":
        magic, ver, m = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad SpaceSaving buffer")
        sk = cls(m)
        sk._mg = MisraGries.from_bytes(buf[_HDR.size:])
        return sk

    def __repr__(self) -> str:
        return (f"SpaceSaving(m={self.m}, tracked={len(self._mg.keys)}, "
                f"n={self.n}, min_count={self.min_count()})")
