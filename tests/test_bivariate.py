"""Bivariate sufficient statistics -> Pearson/OLS (operators/bivariate).

Checks: numpy parity of the quantized outputs, merge-by-addition of
the six sums (the mergeable-sketch contract), sign symmetry of the
magnitude rounding (the floor-vs-trunc int-div hazard), degenerate
guards, and the grouped Spark path.
"""

from __future__ import annotations

import numpy as np
import pytest

from q_digest_spark.operators.bivariate import bivariate_stats, pearson_ols

PPM = 1_000_000


def _sums(x, y):
    x = [int(v) for v in x]
    y = [int(v) for v in y]
    return (
        len(x), sum(x), sum(y),
        sum(v * v for v in x), sum(v * v for v in y),
        sum(a * b for a, b in zip(x, y)),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_numpy_parity(seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 1000, 400)
    y = (0.7 * x + rng.integers(0, 300, 400)).astype(np.int64)
    sign, corr_sq, slope = pearson_ols(*_sums(x, y))
    r = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    b = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    assert sign == (1 if r > 0 else -1 if r < 0 else 0)
    assert abs(corr_sq - r * r * PPM) <= 1  # half-up quantization
    assert abs(slope - b * PPM) <= 1


def test_negative_correlation_sign_symmetry():
    x = list(range(100))
    y_up = [3 * v + (v % 7) for v in x]
    y_dn = [1000 - v for v in y_up]  # exact reflection: N_dn == -N_up
    s_dn = pearson_ols(*_sums(x, y_dn))
    s_up = pearson_ols(*_sums(x, y_up))
    assert s_dn[0] == -1 and s_up[0] == 1
    # identical noise pattern -> mirrored slope magnitudes exactly
    # (the half-away-from-zero magnitude rounding is sign-symmetric)
    assert s_dn[2] == -s_up[2]
    assert s_dn[1] == s_up[1]


def test_merge_is_addition():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, 300)
    y = rng.integers(0, 50, 300)
    whole = _sums(x, y)
    a = _sums(x[:120], y[:120])
    b = _sums(x[120:], y[120:])
    merged = tuple(u + v for u, v in zip(a, b))
    assert merged == whole
    assert pearson_ols(*merged) == pearson_ols(*whole)


def test_degenerate_guards():
    assert pearson_ols(*_sums([5] * 10, list(range(10)))) == (0, 0, 0)
    assert pearson_ols(*_sums(list(range(10)), [3] * 10)) == (0, 0, 0)
    assert pearson_ols(1, 4, 9, 16, 81, 36) == (0, 0, 0)  # n=1


def test_spark_grouped_path(spark):
    rows = [("a", i, 2 * i + (i % 3)) for i in range(50)] + [
        ("b", i, 100 - i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r["g"]: r
        for r in bivariate_stats(df, "x", "y", keys=("g",)).collect()
    }
    xa = [r[1] for r in rows if r[0] == "a"]
    ya = [r[2] for r in rows if r[0] == "a"]
    assert (
        int(out["a"]["n"]), int(out["a"]["sx"]), int(out["a"]["sy"]),
        int(out["a"]["sxx"]), int(out["a"]["syy"]), int(out["a"]["sxy"]),
    ) == _sums(xa, ya)
    sb = pearson_ols(
        out["b"]["n"], out["b"]["sx"], out["b"]["sy"],
        out["b"]["sxx"], out["b"]["syy"], out["b"]["sxy"],
    )
    assert sb == (-1, PPM, -PPM)  # y = 100 - x exactly
