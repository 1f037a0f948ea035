"""key_skew_profile: integer-exact Gini / percentile report over
per-key counts."""

import math

from q_digest_spark.operators.profile import key_skew_profile


def _profile(spark, pairs):
    df = spark.createDataFrame(pairs, "k long, v long")
    return key_skew_profile(df, "k").collect()[0]


def test_uniform_keys_gini_zero(spark):
    # 10 keys x 4 rows each: perfectly balanced -> Gini = 0
    rows = [(k, i) for k in range(10) for i in range(4)]
    r = _profile(spark, rows)
    assert (r.n_rows, r.n_keys, r.max_cnt) == (40, 10, 4)
    assert r.p50_cnt == 4 and r.p99_cnt == 4
    assert r.gini_ppm == 0


def test_single_hot_key(spark):
    # 9 keys with 1 row + 1 key with 91 rows
    rows = [(k, 0) for k in range(9)] + [(99, i) for i in range(91)]
    r = _profile(spark, rows)
    assert (r.n_rows, r.n_keys, r.max_cnt) == (100, 10, 91)
    assert r.p50_cnt == 1 and r.p99_cnt == 91
    # hand Gini: counts sorted asc = [1]*9 + [91]
    counts = [1] * 9 + [91]
    n, tot = len(counts), sum(counts)
    wrs = sum((i + 1) * c for i, c in enumerate(counts))
    expect = math.floor((2 * wrs - (n + 1) * tot) / (n * tot) * 1e6)
    assert r.gini_ppm == expect


def test_one_key_degenerate(spark):
    r = _profile(spark, [(7, i) for i in range(5)])
    assert (r.n_rows, r.n_keys, r.max_cnt) == (5, 1, 5)
    assert r.gini_ppm == 0  # single key: numerator 2*1*5 - 2*5 = 0


def test_matches_bruteforce_on_events(spark, sf_unit):
    df = spark.read.parquet(f"{sf_unit}/events.parquet").where(
        "user_id IS NOT NULL"
    )
    r = key_skew_profile(df, "user_id").collect()[0]
    counts = sorted(
        df.groupBy("user_id").count().toPandas()["count"].tolist()
    )
    n, tot = len(counts), sum(counts)
    wrs = sum((i + 1) * c for i, c in enumerate(counts))
    assert r.n_rows == tot and r.n_keys == n and r.max_cnt == counts[-1]
    assert r.p50_cnt == counts[math.ceil(0.5 * n) - 1]
    assert r.p99_cnt == counts[math.ceil(0.99 * n) - 1]
    assert r.gini_ppm == math.floor(
        (2 * wrs - (n + 1) * tot) / (n * tot) * 1e6
    )
