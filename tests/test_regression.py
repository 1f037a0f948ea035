"""Exact-Cramer OLS (operators/regression.py) — numpy lstsq parity,
merge-by-addition of the sufficient statistics, degenerate designs,
and the ppm quantization contract."""

import numpy as np

from q_digest_spark.operators.regression import (
    _ppm,
    ols_cramer,
    ols_sufficient_stats,
)


def _stats_py(rows):
    s = dict.fromkeys(
        ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"), 0
    )
    for y, x1, x2 in rows:
        s["n"] += 1
        s["s1"] += x1
        s["s2"] += x2
        s["s11"] += x1 * x1
        s["s12"] += x1 * x2
        s["s22"] += x2 * x2
        s["sy"] += y
        s["s1y"] += x1 * y
        s["s2y"] += x2 * y
    return s


def test_cramer_matches_numpy_lstsq():
    rng = np.random.RandomState(7)
    x1 = rng.randint(1, 500, size=200)
    x2 = rng.randint(1, 60, size=200)
    y = 17 + 3 * x1 + 11 * x2 + rng.randint(-5, 6, size=200)
    rows = list(zip(y.tolist(), x1.tolist(), x2.tolist()))
    sign, b0, b1, b2 = ols_cramer(_stats_py(rows))
    X = np.column_stack([np.ones_like(x1), x1, x2]).astype(float)
    ref = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert sign != 0
    for got_ppm, want in zip((b0, b1, b2), ref):
        assert abs(got_ppm / 1e6 - want) < 1e-5, (got_ppm, want)


def test_cramer_exact_on_noiseless_plane():
    rows = [(5 + 2 * a + 7 * b, a, b) for a in range(1, 9) for b in range(1, 7)]
    sign, b0, b1, b2 = ols_cramer(_stats_py(rows))
    assert (b0, b1, b2) == (5_000_000, 2_000_000, 7_000_000)
    assert sign in (-1, 1)


def test_cramer_degenerate_collinear_features():
    rows = [(v, v, 2 * v) for v in range(1, 30)]  # x2 = 2*x1 exactly
    assert ols_cramer(_stats_py(rows)) == (0, 0, 0, 0)


def test_ppm_magnitude_rounding_negative_numerators():
    # -3/2 -> -1500000 under magnitude rounding regardless of floor
    # vs trunc conventions; half cases round away from zero.
    assert _ppm(-3, 2) == -1_500_000
    assert _ppm(3, -2) == -1_500_000
    assert _ppm(-3, -2) == 1_500_000
    assert _ppm(1, 3) == 333_333
    assert _ppm(-1, 3) == -333_333


def test_stats_merge_by_addition():
    rows = [(v * 3 + 1, v, v * v % 17) for v in range(1, 40)]
    full = _stats_py(rows)
    a, b = _stats_py(rows[:20]), _stats_py(rows[20:])
    merged = {k: a[k] + b[k] for k in full}
    assert merged == full
    assert ols_cramer(merged) == ols_cramer(full)


def test_spark_sufficient_stats_parity(spark):
    rows = [(int(3 + 2 * a + 5 * b), int(a), int(b)) for a in range(12) for b in range(9)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    got = ols_sufficient_stats(df, "y", "x1", "x2")
    want = _stats_py(rows)
    assert got == want
    assert ols_cramer(got)[1:] == (3_000_000, 2_000_000, 5_000_000)


def test_bootstrap_mean_ci_brackets_the_mean(spark):
    """Deterministic Poisson bootstrap: the percentile CI must
    bracket the full-sample mean, the replicate count must be B (no
    empty replicates at fixture sizes), and the width must be small
    relative to the mean (Poisson(1) weights average 1, so replicate
    means concentrate)."""
    from tests.conftest import SF_UNIT

    from __spark_entry__ import _BOOT_B, q_bootstrap_mean_ci

    r = q_bootstrap_mean_ci(spark, SF_UNIT).collect()[0]
    assert r["n_reps"] == _BOOT_B
    assert r["ci_lo_q"] <= r["mean_q"] <= r["ci_hi_q"], r
    width = r["ci_hi_q"] - r["ci_lo_q"]
    assert 0 < width < r["mean_q"] // 2, r


def test_stats_subtract_equals_complement_fit():
    """total - fold == direct stats of the complement, so the K-fold
    trick (one grouped pass, K subtraction fits) is exact."""
    from q_digest_spark.operators.regression import stats_subtract

    rows = [(7 + 4 * a + 2 * b, a, b) for a in range(1, 25) for b in range(1, 9)]
    fold0 = [r for i, r in enumerate(rows) if i % 4 == 0]
    rest = [r for i, r in enumerate(rows) if i % 4 != 0]
    total, part, want = _stats_py(rows), _stats_py(fold0), _stats_py(rest)
    assert stats_subtract(total, part) == want
    assert ols_cramer(stats_subtract(total, part)) == ols_cramer(want)


def test_grouped_sufficient_stats_parity(spark):
    rows = [(int(1 + a + 3 * b), int(a), int(b), int(a % 3)) for a in range(10) for b in range(7)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long, g long")
    got = ols_sufficient_stats(df, "y", "x1", "x2", keys=("g",))
    for gv in (0, 1, 2):
        want = _stats_py([(y, a, b) for y, a, b, g in rows if g == gv])
        assert got[(gv,)] == want
