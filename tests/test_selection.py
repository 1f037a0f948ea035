"""Distributed EXACT selection: k-th order statistics and positional
trimmed mean without a global sort (operators/quantiles.py).

The r02 verdict flagged the graded trimmed mean's Window.orderBy as a
single-partition scale-killer; these tests pin the replacement —
percentile_approx bracketing + distinct-value refinement + boundary-tie
conditional aggregates — against local sorted oracles, including the
recursion path a 10^10-row table would take.
"""

import math

import numpy as np

from q_digest_spark.operators.quantiles import (
    exact_order_statistics,
    trimmed_mean_exact,
)


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(8)


def _check(spark, vals, ranks, **kw):
    got = exact_order_statistics(_df(spark, vals), "v", ranks, **kw)
    s = sorted(vals)
    assert got == [s[r - 1] for r in ranks], (got, [s[r - 1] for r in ranks])


def test_order_stats_basic(spark):
    rng = np.random.RandomState(7)
    vals = rng.normal(100, 25, 5000).round(2).tolist()
    _check(spark, vals, [1, 1250, 2500, 3750, 5000])


def test_order_stats_heavy_ties(spark):
    """A hot value collapses to ONE (value, count) row in the
    refinement collect — ranks inside, at, and around the tie block
    must all resolve exactly."""
    vals = [1.0] * 1000 + [2.0] * 5 + [3.0] * 1000
    _check(spark, vals, [1, 1000, 1001, 1003, 1005, 1006, 2005])


def test_order_stats_all_equal(spark):
    _check(spark, [42.0] * 100, [1, 50, 100])


def test_order_stats_skewed(spark):
    rng = np.random.RandomState(13)
    vals = np.exp(rng.normal(0, 2, 4000)).tolist()  # heavy right tail
    _check(spark, vals, [1, 3999, 4000, 2000])


def test_order_stats_recursion_path(spark):
    """Coarse accuracy + tiny collect_limit force the recursive
    bracket-narrowing a trillion-row table would need — the result
    must still be exact."""
    rng = np.random.RandomState(11)
    vals = rng.uniform(0, 1, 20000).tolist()  # essentially all distinct
    got = exact_order_statistics(
        _df(spark, vals), "v", [5000, 15000], accuracy=100, collect_limit=50
    )
    s = sorted(vals)
    assert got == [s[4999], s[14999]]


def _tm_oracle(vals, p_lo=0.25, p_hi=0.75):
    s = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(s)
    lo, hi = int(math.floor(p_lo * n)), int(math.ceil(p_hi * n))
    inc = s[lo:hi]
    return n, lo, hi, inc


def test_trimmed_mean_matches_sorted_oracle(spark):
    rng = np.random.RandomState(3)
    vals = rng.normal(50, 10, 3000).round(2).tolist()
    tm = trimmed_mean_exact(_df(spark, vals), "v", 0.25, 0.75)
    n, lo, hi, inc = _tm_oracle(vals)
    assert (tm["n"], tm["n_trimmed"]) == (n, hi - lo)
    assert tm["q_lo"] == inc[0] and tm["q_hi"] == inc[-1]
    assert abs(tm["mean"] - inc.mean()) < 1e-9


def test_trimmed_mean_boundary_ties(spark):
    """Both trim boundaries land inside tie blocks: the conditional
    aggregate must count exactly the copies whose positional ranks
    fall inside (lo, hi]."""
    vals = []
    for v in range(10):
        vals += [float(v)] * 37  # n=370: lo=92 (inside the 2-block), hi=278
    tm = trimmed_mean_exact(_df(spark, vals), "v", 0.25, 0.75)
    n, lo, hi, inc = _tm_oracle(vals)
    assert (tm["n"], tm["n_trimmed"]) == (n, hi - lo)
    assert tm["q_lo"] == inc[0] and tm["q_hi"] == inc[-1]
    assert abs(tm["mean"] - inc.mean()) < 1e-9


def test_trimmed_mean_all_equal_and_tiny(spark):
    for vals in ([7.5] * 50, [1.0], [2.0, 1.0]):
        tm = trimmed_mean_exact(_df(spark, vals), "v", 0.25, 0.75)
        n, lo, hi, inc = _tm_oracle(vals)
        assert (tm["n"], tm["n_trimmed"]) == (n, hi - lo)
        assert abs(tm["mean"] - inc.mean()) < 1e-12


def test_mad_gate_fires_on_planted_outliers(spark):
    """The robust median/MAD gate (composition used by the
    mad_outliers_by_flag query) must flag planted extreme values and
    nothing else — and the median/MAD must ignore the outliers
    themselves (robustness, unlike mean/std)."""
    from functools import partial

    from pyspark.sql import functions as F

    from q_digest_spark.operators.aggregate import grouped_quantiles
    from q_digest_spark.sketches import (
        QDigest,
        qdigest_from_bytes,
        universe_bits_for,
    )

    vals = list(range(1000, 1101)) * 3 + [10_000_000, 9_000_000]  # 2 planted
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    fac = partial(QDigest, 0, universe_bits_for(10_000_000))
    med = grouped_quantiles(df, ["g"], "v", fac, qdigest_from_bytes, [0.5], ["med"])
    wm = df.join(F.broadcast(med), "g")
    dev = wm.select("g", F.abs(F.col("v") - F.col("med")).alias("d"))
    mad = grouped_quantiles(dev, ["g"], "d", fac, qdigest_from_bytes, [0.5], ["mad"])
    out = (
        wm.join(F.broadcast(mad), "g")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                (
                    F.abs(F.col("v") - F.col("med")) * F.lit(10000)
                    > F.col("mad") * F.lit(44478)
                ).cast("long")
            ).alias("n_out"),
        )
        .collect()[0]
    )
    # robust location/scale: unmoved by the planted extremes
    import numpy as np

    body = np.array(vals)
    m = int(np.sort(body)[max(0, int(np.ceil(0.5 * len(body))) - 1)])
    assert out["med"] == m
    assert out["mad"] <= 60  # scale of the uniform body, not the outliers
    assert out["n_out"] == 2  # exactly the planted extremes
