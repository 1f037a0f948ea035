"""Hodges–Lehmann shift estimator: histogram-convolution form vs a
brute-force pairwise oracle (lower-median convention: smallest d with
cumulative pair weight >= ceil(N/2))."""

import numpy as np

from q_digest_spark.operators.robust import hodges_lehmann_shift


def _brute_hl(x, y):
    d = np.sort((np.asarray(x)[:, None] - np.asarray(y)[None, :]).ravel())
    n = len(d)
    k = (n + 1) // 2
    return int(d[k - 1]), n


def _run(spark, x, y):
    dx = spark.createDataFrame([(int(v),) for v in x], "v long")
    dy = spark.createDataFrame([(int(v),) for v in y], "v long")
    r = hodges_lehmann_shift(dx, dy, "v").collect()[0]
    return r["hl_shift"], r["n_pairs"]


def test_hl_known_shift(spark):
    """Y = X + 7 elementwise: HL of (X, Y) is exactly -7."""
    x = [1, 5, 9, 20, 33]
    y = [v + 7 for v in x]
    shift, n = _run(spark, x, y)
    assert (shift, n) == (-7, 25)
    assert (shift, n) == _brute_hl(x, y)


def test_hl_matches_bruteforce_random(spark):
    rng = np.random.default_rng(17)
    for trial in range(3):
        x = rng.integers(-50, 200, 40)
        y = rng.integers(-80, 150, 37)
        got = _run(spark, x, y)
        assert got == _brute_hl(x, y), trial


def test_hl_duplicates_and_even_n(spark):
    """Heavy ties (histogram weights > 1) and an even pair count
    exercise the ceil(N/2) lower-median edge."""
    x = [10, 10, 10, 20]
    y = [10, 15]
    got = _run(spark, x, y)
    assert got == _brute_hl(x, y)
    assert got[1] == 8


def test_hl_single_values(spark):
    assert _run(spark, [42], [40]) == (2, 1)
