"""DGIM sliding-window counter (Datar, Gionis, Indyk, Motwani 2002).

Counts events in the trailing time window of a stream using
O(r * log n) buckets instead of the raw events. Each bucket is
``(ts, size)`` — ``ts`` the timestamp of the NEWEST event it covers,
``size`` a power of two; scanning newest-to-oldest, sizes are
non-decreasing with at least 1 and at most ``r`` buckets per size
(``r = 2`` is the classic variant). At query time every kept bucket
except the oldest lies fully inside the window, so

    est = kept_total - oldest + ceil(oldest / 2)

is within ``1 / (2 (r - 1))`` relative error of the true count
(<= 50% for r = 2) — the integer bound flag the graded query asserts
is ``2 * |est - exact| <= exact``.

The textbook build inserts one event at a time and repairs the
invariant with a merge cascade (three buckets of size s -> merge the
two oldest into one of size 2s stamped with the newer timestamp).
That cascade is exactly a counter in redundant binary: the digit
vector d_i (number of buckets of size 2^i) increments d_0 and, when a
digit reaches r + 1, merges two oldest (digit -> r - 1, carry 1). The
reachable state is therefore a CLOSED FORM of n alone — per level,
with m = increments received::

    m <= r:  d = m,          carries out = 0
    m >  r:  carries out c = (m - r + 1) div 2,   d = m - 2 c

so ``from_sorted_ts`` builds the canonical end-of-stream state in
O(log n) after the sort — no per-event Python loop — and because
bucket spans are contiguous suffix runs, each bucket's timestamp is a
direct index into the sorted array. ``insert`` keeps the literal
per-event cascade as the property-test oracle (closed form == cascade
for every n, verified in tests).

Sequential-prefix caveat: DGIM state is order-dependent; summaries of
adjacent intervals do NOT merge by concatenation (a size gap between
the chunks breaks the >= 1-bucket-per-size invariant the 50% proof
needs). Distribute ACROSS keys (one sorted pass per key — the same
shape as applyInPandasWithState streaming), not across time chunks of
one key.

Public methodology (Datar et al., SIAM J. Comput. 2002); no reference
counterpart.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBI")
_MAGIC = b"DGM1"


class DGIM:
    """Bucket list held oldest-first as parallel int64 arrays."""

    __slots__ = ("r", "ts", "size")

    def __init__(self, r: int = 2):
        if r < 2:
            raise ValueError(f"r must be >= 2, got {r}")
        self.r = int(r)
        self.ts: list[int] = []  # oldest-first, newest event per bucket
        self.size: list[int] = []  # powers of two, non-increasing

    # -- build ------------------------------------------------------------

    @classmethod
    def from_sorted_ts(cls, ts, r: int = 2) -> "DGIM":
        """Canonical state after inserting ``ts`` (ascending) into an
        empty sketch — O(log n) via the redundant-binary closed form."""
        sk = cls(r)
        a = np.asarray(ts, dtype=np.int64)
        n = len(a)
        if n and np.any(a[1:] < a[:-1]):
            raise ValueError("timestamps must be ascending")
        digits = []  # level i -> d_i
        m = n
        while m > 0:
            if m <= r:
                digits.append(m)
                m = 0
            else:
                c = (m - r + 1) // 2
                digits.append(m - 2 * c)
                m = c
        # newest-first: d_0 buckets of size 1, then d_1 of size 2, ...
        off = 0  # events newer than the current bucket
        out = []  # newest-first (ts, size)
        for lvl, d in enumerate(digits):
            s = 1 << lvl
            for _ in range(d):
                out.append((int(a[n - off - 1]), s))
                off += s
        out.reverse()
        sk.ts = [t for t, _ in out]
        sk.size = [s for _, s in out]
        return sk

    def insert(self, t: int) -> None:
        """Per-event cascade (property-test oracle for the closed form)."""
        if self.ts and t < self.ts[-1]:
            raise ValueError("timestamps must be ascending")
        self.ts.append(int(t))
        self.size.append(1)
        i = len(self.size) - 1
        while True:
            s = self.size[i]
            lo = i
            while lo > 0 and self.size[lo - 1] == s:
                lo -= 1
            if i - lo + 1 <= self.r:
                break
            # merge the two OLDEST buckets of size s -> 2s, newer ts
            self.ts[lo] = self.ts[lo + 1]
            self.size[lo] = 2 * s
            del self.ts[lo + 1]
            del self.size[lo + 1]
            # the loop re-enters at the doubled bucket: its run of
            # equal-size peers only extends OLDER-ward (sizes are
            # non-increasing toward the new end), which the lo-scan
            # covers — so this single loop is the full cascade
            i = lo

    # -- query ------------------------------------------------------------

    def estimate(self, t_now: int, window: int) -> int:
        """Estimated number of events with ts in (t_now - window, t_now].
        Guarantee (r=2): 2 * |est - exact| <= exact."""
        lo = int(t_now) - int(window)
        kept = [
            (t, s) for t, s in zip(self.ts, self.size) if lo < t <= t_now
        ]
        if not kept:
            return 0
        total = sum(s for _, s in kept)
        oldest = kept[0][1]
        return total - oldest + (oldest + 1) // 2

    def n_buckets(self) -> int:
        return len(self.size)

    # -- serialization ----------------------------------------------------

    def to_bytes(self) -> bytes:
        body = np.asarray(self.ts + self.size, dtype=np.int64).tobytes()
        return _HDR.pack(_MAGIC, self.r, len(self.ts)) + body

    @classmethod
    def from_bytes(cls, raw: bytes) -> "DGIM":
        magic, r, n = _HDR.unpack_from(raw, 0)
        if magic != _MAGIC:
            raise ValueError("bad DGIM header")
        flat = np.frombuffer(raw, dtype=np.int64, offset=_HDR.size)
        sk = cls(r)
        sk.ts = [int(x) for x in flat[:n]]
        sk.size = [int(x) for x in flat[n:]]
        return sk


def dgim_from_bytes(raw: bytes) -> DGIM:
    """Module-level wrapper (safe to close over in Spark tasks)."""
    return DGIM.from_bytes(raw)
