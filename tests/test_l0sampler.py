"""L0 sampler: support membership under deletion, merge linearity,
coverage across independent key spaces, serialization."""

import numpy as np
import pytest

from q_digest_spark.sketches.l0sampler import L0Sampler


def test_single_key_recovers_exactly():
    sk = L0Sampler()
    sk.update_batch(np.array([12345]), np.array([7]))
    k, w = sk.sample()
    assert w == 7
    assert k == int(L0Sampler.key32_of(np.array([12345]))[0])


def test_delete_cancellation_sample_in_surviving_support():
    """Insert A ∪ B, delete B (possibly in a different order /
    different partial): every sample must map into A."""
    rng = np.random.default_rng(3)
    a = rng.choice(10_000_000, 500, replace=False).astype(np.int64)
    b = rng.choice(np.setdiff1d(np.arange(20_000_000, 20_100_000), a), 400,
                   replace=False).astype(np.int64)
    sk = L0Sampler()
    sk.update_batch(np.concatenate([a, b]))
    sk.update_batch(b, -np.ones(len(b), dtype=np.int64))
    k, w = sk.sample()
    assert w == 1
    assert k in set(L0Sampler.key32_of(a).tolist())


def test_empty_and_fully_cancelled_support():
    sk = L0Sampler()
    assert sk.sample() is None
    keys = np.arange(1000, dtype=np.int64)
    sk.update_batch(keys)
    sk.update_batch(keys, -np.ones(1000, dtype=np.int64))
    assert sk.sample() is None  # every counter identically zero
    assert not sk.c0.any() and not sk.c1.any()
    assert not sk.cfa.any() and not sk.cfb.any()


def test_merge_is_exact_linearity():
    """Merging partials gives IDENTICAL counters to the bulk build —
    the linear-sketch property, bit-for-bit."""
    rng = np.random.default_rng(9)
    keys = rng.choice(5_000_000, 3_000, replace=False).astype(np.int64)
    w = rng.integers(-3, 4, 3_000).astype(np.int64)
    bulk = L0Sampler()
    bulk.update_batch(keys, w)
    parts = np.array_split(np.arange(3_000), 7)
    merged = L0Sampler()
    for p in parts:
        s = L0Sampler()
        s.update_batch(keys[p], w[p])
        merged.merge(s)
    assert np.array_equal(merged.c0, bulk.c0)
    assert np.array_equal(merged.c1, bulk.c1)
    assert np.array_equal(merged.cfa, bulk.cfa)
    assert np.array_equal(merged.cfb, bulk.cfb)


def test_coverage_over_independent_supports():
    """Across 60 disjoint key spaces, recovery succeeds and the
    sample is in-support every time; the sampled keys vary (not a
    degenerate constant picker)."""
    hits, seen = 0, set()
    for t in range(60):
        keys = (np.arange(200, dtype=np.int64) + t * 1_000_003) * 7919
        sk = L0Sampler()
        sk.update_batch(keys)
        r = sk.sample()
        if r is None:
            continue
        k, w = r
        assert k in set(L0Sampler.key32_of(keys).tolist())
        assert w >= 1
        hits += 1
        seen.add(k)
    assert hits >= 58  # exp(-buckets) failure is rare
    assert len(seen) >= 50  # different supports -> different samples


def test_sample_position_spread_within_one_support():
    """Within a single support, which key recovers is governed by the
    hash family, not input order: shuffling the stream or splitting
    it differently yields the same deterministic sample."""
    rng = np.random.default_rng(4)
    keys = rng.choice(1_000_000, 400, replace=False).astype(np.int64)
    base = L0Sampler()
    base.update_batch(keys)
    want = base.sample()
    for seed in range(3):
        perm = np.random.default_rng(seed).permutation(len(keys))
        sk = L0Sampler()
        for chunk in np.array_split(perm, 5):
            sk.update_batch(keys[chunk])
        assert sk.sample() == want


def test_roundtrip_bytes():
    rng = np.random.default_rng(1)
    sk = L0Sampler()
    sk.update_batch(rng.choice(10**9, 2_000, replace=False).astype(np.int64))
    sk2 = L0Sampler.from_bytes(sk.to_bytes())
    assert sk2.sample() == sk.sample()
    assert np.array_equal(sk2.c1, sk.c1)


def test_rejects_bad_shape():
    with pytest.raises(ValueError):
        L0Sampler(levels=0)
    with pytest.raises(ValueError):
        L0Sampler(buckets=1)
    a, b = L0Sampler(10, 8), L0Sampler(12, 8)
    with pytest.raises(ValueError):
        a.merge(b)
