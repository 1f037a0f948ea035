"""Reciprocal-rank fusion (operators/fusion.py)."""

import pytest
from pyspark.sql import SparkSession, functions as F

from q_digest_spark.operators.fusion import rrf_fuse, topk_ranks


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-fusion")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_topk_ranks_total_order_and_limit(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "id long, s long"
    )
    got = {
        r["id"]: r["rank"]
        for r in topk_ranks(
            df, "id", [F.col("s").desc(), F.col("id").asc()], 4
        ).collect()
    }
    # s=2: ids 2,5 first (id asc), then s=1: ids 1,4
    assert got == {2: 1, 5: 2, 8: 3, 1: 4}


def test_rrf_missing_list_contributes_zero(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "id long, rank long")
    rows = {
        r["id"]: (r["a_rank"], r["b_rank"], r["rrf_q"])
        for r in rrf_fuse({"a": a, "b": b}, c=60).collect()
    }
    q = 1_000_000_000
    assert rows[1] == (1, None, q // 61)
    assert rows[2] == (2, 1, q // 62 + q // 61)
    assert rows[3] == (None, 2, q // 62)


def test_rrf_top_n_deterministic_tiebreak(spark):
    # two ids with identical fused score -> id asc decides
    a = spark.createDataFrame([(7, 1), (3, 2)], "id long, rank long")
    b = spark.createDataFrame([(3, 1), (7, 2)], "id long, rank long")
    top = rrf_fuse({"a": a, "b": b}, top_n=1).collect()
    assert len(top) == 1 and top[0]["id"] == 3


def test_rrf_scores_are_integers_and_engine_portable(spark):
    # 60 + rank = 64 divides 1e9 exactly: boundary case for any
    # float-division implementation; div keeps it integer-exact
    a = spark.createDataFrame([(1, 4)], "id long, rank long")
    (row,) = rrf_fuse({"a": a}).collect()
    assert row["rrf_q"] == 15_625_000
