"""AMS tug-of-war (F2 / join-size) sketch: accuracy within the
Chebyshev bound, bit-identical merge under every partition order
(state is element-wise signed addition), weighted == unit updates,
serialization round-trip, and the Spark one-scan aggregation path.
"""

import functools
import itertools

import numpy as np
import pytest

from q_digest_spark.sketches.ams import AMS
from q_digest_spark.sketches.hashing import hash_i64

N = 120_000
PARTS = 4


def _zipf_keys(seed=3, n=N, mod=30_000):
    rng = np.random.RandomState(seed)
    return (rng.zipf(1.3, n) % mod).astype(np.int64)


def _exact_f2(keys):
    _, cnts = np.unique(keys, return_counts=True)
    return int(np.sum(cnts.astype(object) ** 2))


def test_f2_within_bound():
    keys = _zipf_keys()
    exact = _exact_f2(keys)
    sk = AMS(7, 8192)
    sk.update_batch(keys)
    est = sk.f2()
    assert abs(est - exact) <= sk.rel_eps(3.0) * exact
    assert sk.n == len(keys)


def test_merge_bitwise_identical_all_orders():
    keys = _zipf_keys(seed=9)
    parts = np.array_split(keys, PARTS)
    sks = []
    for p in parts:
        s = AMS(5, 2048)
        s.update_batch(p)
        sks.append(s)
    ref = None
    for perm in itertools.permutations(range(PARTS)):
        acc = functools.reduce(
            lambda a, b: a.merge(b),
            [AMS.from_bytes(sks[i].to_bytes()) for i in perm],
        )
        got = acc.to_bytes()
        ref = ref or got
        assert got == ref
    bulk = AMS(5, 2048)
    bulk.update_batch(keys)
    assert ref == bulk.to_bytes()


def test_weighted_equals_unit_updates():
    keys = _zipf_keys(seed=5, n=50_000)
    vals, cnts = np.unique(keys, return_counts=True)
    w = AMS(5, 1024)
    w.update_hashes(hash_i64(vals), cnts.astype(np.int64))
    u = AMS(5, 1024)
    u.update_hashes(hash_i64(keys))
    assert w.to_bytes() == u.to_bytes()


def test_roundtrip_and_shape_guard():
    sk = AMS(3, 512)
    sk.update_batch(np.arange(1000, dtype=np.int64))
    rt = AMS.from_bytes(sk.to_bytes())
    assert np.array_equal(rt.table, sk.table) and rt.n == sk.n
    with pytest.raises(ValueError):
        sk.merge(AMS(3, 1024))
    with pytest.raises(ValueError):
        sk.inner_product(AMS(4, 512))


def test_inner_product_join_size():
    a_keys = _zipf_keys(seed=1, n=100_000, mod=20_000)
    b_keys = _zipf_keys(seed=2, n=80_000, mod=20_000)
    av, ac = np.unique(a_keys, return_counts=True)
    bv, bc = np.unique(b_keys, return_counts=True)
    freq_a = dict(zip(av.tolist(), ac.tolist()))
    exact = sum(freq_a.get(int(v), 0) * int(c) for v, c in zip(bv, bc))
    sa = AMS(7, 8192)
    sa.update_batch(a_keys)
    sb = AMS(7, 8192)
    sb.update_batch(b_keys)
    est = sa.inner_product(sb)
    slack = 3.0 * np.sqrt(2.0 * _exact_f2(a_keys) * _exact_f2(b_keys) / 8192)
    assert abs(est - exact) <= slack


def test_spark_ams_of_matches_local(spark):
    import pandas as pd

    keys = _zipf_keys(seed=13, n=60_000)
    sdf = spark.createDataFrame(pd.DataFrame({"k": keys})).repartition(8)

    from q_digest_spark.operators.quantiles import ams_of

    sk = ams_of(sdf, "k", depth=5, width=4096)
    exact = _exact_f2(keys)
    assert abs(sk.f2() - exact) <= sk.rel_eps(3.0) * exact
    assert sk.n == len(keys)


def test_point_estimates_exact_when_wide():
    """Width >> #keys: every key gets collision-free rows, the median
    recovers the exact count (incl. after turnstile deletes)."""
    sk = AMS(depth=7, width=1 << 14)
    keys = np.array([f"k{i}" for i in range(8)], dtype=object)
    counts = np.array([100, 50, 25, 12, 6, 3, 2, 1], dtype=np.int64)
    from q_digest_spark.sketches.hashing import hash_any

    h = hash_any(keys)
    sk.update_hashes(h, counts)
    # retract k0 entirely and half of k1 (turnstile)
    sk.update_hashes(h[:2], np.array([-100, -25], dtype=np.int64))
    est = sk.point_estimates(h)
    want = np.array([0, 25, 25, 12, 6, 3, 2, 1], dtype=np.int64)
    assert np.array_equal(est, want), (est, want)


def test_point_estimates_merge_invariant():
    """Point queries after a partial-merge equal those of a single
    sketch over the union (merge is elementwise addition)."""
    from q_digest_spark.sketches.hashing import hash_any

    h1 = hash_any(np.arange(0, 500))
    h2 = hash_any(np.arange(250, 700))
    a, b, whole = AMS(5, 4096), AMS(5, 4096), AMS(5, 4096)
    a.update_hashes(h1)
    b.update_hashes(h2)
    whole.update_hashes(np.concatenate([h1, h2]))
    merged = AMS.from_bytes(a.to_bytes()).merge(AMS.from_bytes(b.to_bytes()))
    probe = hash_any(np.arange(0, 700, 7))
    assert np.array_equal(merged.point_estimates(probe), whole.point_estimates(probe))


def test_point_estimates_error_within_bound():
    """Zipf-ish stream, modest width: |est - true| <= 6 per-row sigma
    for every probed key (median amplification makes 6 sigma safe)."""
    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 20_000) % 1000
    from collections import Counter

    true = Counter(keys.tolist())
    from q_digest_spark.sketches.hashing import hash_any

    sk = AMS(depth=7, width=2048)
    sk.update_hashes(hash_any(keys))
    probe_keys = np.arange(100)
    est = sk.point_estimates(hash_any(probe_keys))
    f2 = sum(c * c for c in true.values())
    thr = 6 * np.sqrt(f2 / 2048)
    for k, e in zip(probe_keys, est):
        assert abs(e - true.get(int(k), 0)) <= thr, (k, e, true.get(int(k), 0))


def test_even_depth_medians_sign_symmetric():
    """Even-depth point/inner-product medians truncate toward zero —
    a delete-heavy stream must mirror the insert-heavy one exactly."""
    pos, neg = AMS(depth=6, width=1 << 12), AMS(depth=6, width=1 << 12)
    from q_digest_spark.sketches.hashing import hash_any

    h = hash_any(np.arange(40))
    w = np.arange(1, 41, dtype=np.int64)
    pos.update_hashes(h, w)
    neg.update_hashes(h, -w)
    ep = pos.point_estimates(h)
    en = neg.point_estimates(h)
    assert np.array_equal(ep, -en), (ep[:5], en[:5])
