"""VarOpt_k sampling: total preservation, heavy exactness, sample
size, unbiasedness over seeds, merge closure, serialization."""

import numpy as np
import pytest

from q_digest_spark.sketches.varopt import VarOpt


def _zipf_weights(rng, n):
    return (1.0 / rng.pareto(1.5, n) + 1.0) * 10.0


def test_small_stream_exact():
    sk = VarOpt(16)
    keys = np.arange(10)
    w = np.arange(1.0, 11.0)
    sk.update_batch(keys, w)
    assert len(sk.keys) == 10
    assert sk.subset_sum(lambda k: k < 5) == w[:5].sum()
    assert sk.total_w == w.sum()


def test_sample_size_and_total_preservation():
    rng = np.random.default_rng(3)
    sk = VarOpt(64)
    keys = np.arange(50_000)
    w = _zipf_weights(rng, 50_000)
    sk.update_batch(keys, w)
    assert len(sk.keys) == 64  # EXACTLY k, the VarOpt contract
    assert np.isclose(sk.weights.sum(), w.sum(), rtol=1e-9)
    assert sk.n == 50_000


def test_heavy_items_kept_exactly():
    """A few giant weights must always be in the sample with their
    exact weight (w > tau is kept verbatim)."""
    rng = np.random.default_rng(7)
    keys = np.arange(10_000)
    w = rng.uniform(1, 2, 10_000)
    w[:5] = 1e6  # giants
    sk = VarOpt(32)
    order = rng.permutation(10_000)
    for chunk in np.array_split(order, 17):
        sk.update_batch(keys[chunk], w[chunk])
    pos = {int(k): float(wt) for k, wt in zip(sk.keys, sk.weights)}
    for g in range(5):
        assert pos[g] == 1e6, g


def test_unbiasedness_over_seeds():
    """Subset-sum estimates average to the exact value: mean over 200
    independent sketches within 4 standard errors."""
    rng = np.random.default_rng(11)
    n = 5_000
    keys = np.arange(n)
    w = _zipf_weights(rng, n)
    subset = keys % 7 == 0
    exact = float(w[subset].sum())
    ests = []
    for seed in range(200):
        sk = VarOpt(32)
        sk._coin = seed * 1_000_003  # decorrelate offsets
        perm = np.random.default_rng(seed).permutation(n)
        for chunk in np.array_split(perm, 5):
            sk.update_batch(keys[chunk], w[chunk])
        ests.append(sk.subset_sum(lambda k: k % 7 == 0))
    ests = np.asarray(ests)
    se = ests.std(ddof=1) / np.sqrt(len(ests))
    assert abs(ests.mean() - exact) <= 4 * max(se, 1e-9), (
        ests.mean(),
        exact,
        se,
    )


def test_error_envelope_over_seeds():
    """Every single-run estimate stays inside the asserted 4-sigma
    envelope (error_bound)."""
    rng = np.random.default_rng(13)
    n = 20_000
    keys = np.arange(n)
    w = _zipf_weights(rng, n)
    for seed in range(30):
        sk = VarOpt(64)
        sk._coin = seed * 7_777_777
        perm = np.random.default_rng(100 + seed).permutation(n)
        for chunk in np.array_split(perm, 8):
            sk.update_batch(keys[chunk], w[chunk])
        for mod in (3, 5, 11):
            exact = float(w[keys % mod == 0].sum())
            est = sk.subset_sum(lambda k, m=mod: k % m == 0)
            assert abs(est - exact) <= sk.error_bound(), (
                seed,
                mod,
                est,
                exact,
                sk.error_bound(),
            )


def test_merge_closure_and_total():
    rng = np.random.default_rng(5)
    n = 30_000
    keys = np.arange(n)
    w = _zipf_weights(rng, n)
    parts = np.array_split(np.arange(n), 16)
    sks = []
    for i, p in enumerate(parts):
        s = VarOpt(64)
        s._coin = i * 99_991
        s.update_batch(keys[p], w[p])
        sks.append(s)
    merged = sks[0]
    for s in sks[1:]:
        merged.merge(s)
    assert len(merged.keys) == 64
    assert np.isclose(merged.weights.sum(), w.sum(), rtol=1e-9)
    assert merged.n == n
    exact = float(w[keys % 4 == 0].sum())
    est = merged.subset_sum(lambda k: k % 4 == 0)
    assert abs(est - exact) <= merged.error_bound()


def test_merge_mixed_k_uses_min():
    a, b = VarOpt(64), VarOpt(32)
    a.update_batch(np.arange(100), np.ones(100))
    b.update_batch(np.arange(100, 200), np.ones(100))
    a.merge(b)
    assert a.k == 32 and len(a.keys) == 32
    fresh = VarOpt(16)
    fresh.merge(a)
    assert fresh.k == 32  # adopting a partial's k when empty


def test_roundtrip_bytes():
    rng = np.random.default_rng(1)
    sk = VarOpt(32)
    sk.update_batch(np.arange(1000), _zipf_weights(rng, 1000))
    sk2 = VarOpt.from_bytes(sk.to_bytes())
    assert sk2.k == sk.k and sk2.n == sk.n
    assert np.array_equal(sk2.keys, sk.keys)
    assert np.array_equal(sk2.weights, sk.weights)
    assert sk2.total_w == sk.total_w


def test_rejects_bad_k_and_filters_nonpositive():
    with pytest.raises(ValueError):
        VarOpt(1)
    sk = VarOpt(4)
    sk.update_batch(
        np.arange(4), np.array([1.0, -2.0, np.nan, np.inf])
    )
    assert sk.n == 1 and sk.total_w == 1.0


def test_varopt_of_spark(spark, sf_test):
    """Distributed build: exactly k sample rows, total preserved,
    per-lang subset sums inside the envelope."""
    import numpy as _np
    from pyspark.sql import functions as F

    from q_digest_spark.operators.sampling import varopt_of

    df = spark.read.parquet(f"{sf_test}/documents.parquet").where(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    sk = varopt_of(df, "doc_id", "n_chars", k=64)
    rows = df.select(
        "doc_id", F.col("n_chars").cast("double").alias("w"), "lang"
    ).collect()
    w_by_id = {r["doc_id"]: r["w"] for r in rows}
    lang_by_id = {r["doc_id"]: r["lang"] for r in rows}
    total = sum(w_by_id.values())
    assert len(sk.keys) == 64
    assert sk.n == len(rows)
    assert _np.isclose(sk.weights.sum(), total, rtol=1e-9)
    assert _np.isclose(sk.total_w, total, rtol=1e-9)
    langs = sorted(set(lang_by_id.values()))
    for lg in langs:
        exact = sum(w for i, w in w_by_id.items() if lang_by_id[i] == lg)
        ids = set(int(k) for k in sk.keys)
        est = float(
            sum(
                wt
                for k, wt in zip(sk.keys, sk.weights)
                if lang_by_id[int(k)] == lg
            )
        )
        assert abs(est - exact) <= sk.error_bound(), (lg, est, exact)
