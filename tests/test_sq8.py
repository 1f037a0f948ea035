"""SQ8 scalar-quantized ANN (operators/similarity.sq8_topk)."""

import numpy as np
import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.similarity import sq8_topk


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-sq8")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_sq8_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    vecs = (rng.random((40, 16)) - 0.5).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["dot_q"])
        for r in sq8_topk(df, "vec_id", "embedding", [0, 1], k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]

    # reference: round-half-away-from-zero on the float64 widening
    x = vecs.astype(np.float64) * 128.0
    codes = np.sign(x) * np.floor(np.abs(x) + 0.5)
    want = []
    for q in (0, 1):
        dots = (codes @ codes[q]).astype(np.int64)
        order = sorted(
            (int(i) for i in range(40) if i != q),
            key=lambda i: (-dots[i], i),
        )[:3]
        want += [(q, r + 1, i, int(dots[i])) for r, i in enumerate(order)]
    assert got == want


def test_sq8_self_excluded_and_exact_duplicate_first(spark):
    base = [0.25, -0.125, 0.5]
    rows = [
        (0, base),
        (1, base),                      # identical vector
        (2, [0.5, 0.5, -0.5]),
        (3, [-0.25, 0.125, -0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["rank"], r["neighbor_id"])
        for r in sq8_topk(df, "vec_id", "embedding", [0], k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got[0] == (1, 1)             # its duplicate, never itself
    assert all(n != 0 for _, n in got)
