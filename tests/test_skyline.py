"""Pareto skyline (operators/skyline.py): brute-force parity,
tie semantics, partition invariance, and the staircase shape.
"""

from __future__ import annotations

import numpy as np
import pytest

from q_digest_spark.operators.skyline import _sweep, skyline_2d


def _brute(pairs):
    out = set()
    for q in pairs:
        if not any(
            p[0] >= q[0] and p[1] >= q[1] and (p[0] > q[0] or p[1] > q[1])
            for p in pairs
        ):
            out.add(q)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sweep_brute_force_parity(seed):
    rng = np.random.default_rng(seed)
    m1 = rng.integers(0, 40, 300)
    m2 = rng.integers(0, 40, 300)
    pairs = list({(int(a), int(b)) for a, b in zip(m1, m2)})
    a1 = np.array([p[0] for p in pairs], dtype=np.int64)
    a2 = np.array([p[1] for p in pairs], dtype=np.int64)
    got = {(int(a1[i]), int(a2[i])) for i in _sweep(a1, a2)}
    assert got == _brute(pairs)


def test_staircase_and_ties(spark):
    rows = [
        (1, 10, 1), (2, 8, 5), (3, 5, 8), (4, 1, 10),  # the frontier
        (5, 8, 5),   # tie with id 2: equal points never dominate
        (6, 7, 5),   # dominated by (8,5)
        (7, 10, 0),  # dominated by (10,1)
        (8, 0, 0),
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = sorted(
        (r["id"], r["m1"], r["m2"])
        for r in skyline_2d(df, "id", "a", "b").collect()
    )
    assert got == [
        (1, 10, 1), (2, 8, 5), (3, 5, 8), (4, 1, 10), (5, 8, 5),
    ]


def test_partition_invariance(spark):
    rng = np.random.default_rng(9)
    rows = [
        (i, int(a), int(b))
        for i, (a, b) in enumerate(zip(rng.integers(0, 60, 500),
                                       rng.integers(0, 60, 500)))
    ]
    df1 = spark.createDataFrame(rows, "id long, a long, b long").repartition(1)
    df7 = spark.createDataFrame(rows, "id long, a long, b long").repartition(7)
    s1 = sorted(tuple(r) for r in skyline_2d(df1, "id", "a", "b").collect())
    s7 = sorted(tuple(r) for r in skyline_2d(df7, "id", "a", "b").collect())
    assert s1 == s7
    pairs = list({(a, b) for _, a, b in rows})
    sky = _brute(pairs)
    assert {(a, b) for _, a, b in s1} == sky
