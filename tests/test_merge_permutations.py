"""Merge associativity across partition permutations for EVERY sketch
(north_rule: "merge associativity verified by comparing
partition-merge-order permutations").

Two strengths of guarantee, both asserted:
- HLL / Count-Min / Bloom state is element-wise max / sum / or, so any
  merge order must produce BIT-IDENTICAL serialized state;
- Q-Digest / KLL / t-digest compaction is order-sensitive, so every
  permutation must independently satisfy the published rank bound
  (the reference's own contract — its merge is not deterministic
  across orders either, serial-implementation/src/qcore.c:390-417).
"""

import itertools

import numpy as np

from q_digest_spark.sketches import HLL, KLL, Bloom, CountMin, QDigest, TDigest

N = 40_000
PARTS = 4


def _parts(seed=11):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 1 << 16, N).astype(np.int64)
    return vals, np.array_split(vals, PARTS)


def _merged(factory, parts, perm):
    acc = factory()
    for i in perm:
        cur = factory()
        cur.update_batch(parts[i])
        acc.merge(cur)
    return acc


def test_bitwise_identical_state_sketches():
    vals, parts = _parts()
    for factory in (lambda: HLL(12), lambda: CountMin(5, 4096), lambda: Bloom(1 << 16, 5)):
        ref_bytes = None
        for perm in itertools.permutations(range(PARTS)):
            got = _merged(factory, parts, perm).to_bytes()
            if ref_bytes is None:
                ref_bytes = got
            assert got == ref_bytes, f"{factory().__class__.__name__} order-dependent"


def test_quantile_sketches_bound_under_all_orders():
    vals, parts = _parts()
    s = np.sort(vals)
    n = len(vals)

    def rank_err(est, p):
        lo = np.searchsorted(s, est, "left")
        hi = np.searchsorted(s, est, "right")
        t = p * n
        return 0.0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t)) / n

    cases = [
        (lambda: QDigest(128, 16), 16 / 128),
        (lambda: KLL(200), KLL(200).error_bound() * 1.5),
        (lambda: TDigest(200), 0.015),
    ]
    for factory, bound in cases:
        for perm in itertools.permutations(range(PARTS)):
            sk = _merged(factory, parts, perm)
            assert sk.n == n
            for p in (0.05, 0.5, 0.95):
                q = sk.quantiles([p])[0]
                assert rank_err(q, p) <= bound, (factory().__class__.__name__, p, perm)
