"""SCD2 history compaction (operators/scd.py)."""

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.scd import OPEN_END, scd2_history


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-scd")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _d(day):
    return dt.datetime(2024, 1, day)


def test_runs_collapse_and_intervals_close(spark):
    rows = [
        (1, _d(1), "O"),
        (1, _d(2), "O"),   # re-assertion: not a new version
        (1, _d(3), "F"),
        (1, _d(5), "F"),
        (1, _d(8), "O"),   # back to O: IS a new version
        (2, _d(4), "P"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, s string")
    got = sorted(
        (r["k"], r["s"], r["valid_from"], r["valid_to"])
        for r in scd2_history(df, "k", "ts", ["s"]).collect()
    )
    sentinel = dt.datetime(9999, 12, 31)
    assert got == [
        (1, "F", _d(3), _d(8)),
        (1, "O", _d(1), _d(3)),
        (1, "O", _d(8), sentinel),
        (2, "P", _d(4), sentinel),
    ]


def test_multi_attribute_state_and_null_attr(spark):
    rows = [
        (1, _d(1), "a", None),
        (1, _d(2), "a", None),        # equal incl. NULL: collapses
        (1, _d(3), "a", "x"),         # NULL -> x: new version
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, s string, t string")
    got = sorted(
        (
            (r["s"], r["t"], r["valid_from"])
            for r in scd2_history(df, "k", "ts", ["s", "t"]).collect()
        ),
        key=lambda x: x[2],
    )
    assert got == [("a", None, _d(1)), ("a", "x", _d(3))]


def test_open_end_constant_is_timestamp_parseable():
    assert OPEN_END.startswith("9999-12-31")


def test_merge_on_read_semantics(spark):
    """Deletes drop, upserts replace, delete+upsert resolves to the
    upsert, and an upsert with a fresh key is an insert."""
    from q_digest_spark.operators.scd import merge_on_read

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    deletes = spark.createDataFrame([(2,), (3,)], "k long")
    upserts = spark.createDataFrame(
        [(3, "C2"), (9, "new")], "k long, v string"
    )
    got = {
        (r["k"], r["v"])
        for r in merge_on_read(base, deletes, upserts, "k").collect()
    }
    assert got == {(1, "a"), (4, "d"), (3, "C2"), (9, "new")}


def test_merge_on_read_plan_broadcasts_change_sides(spark):
    """The resolved view must anti-join via BROADCAST (zero shuffles
    of base rows) — the 100 TB read-path requirement."""
    import io
    from contextlib import redirect_stdout

    from q_digest_spark.operators.scd import merge_on_read

    base = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    deletes = spark.range(10).selectExpr("id * 97 AS k")
    upserts = spark.range(10).selectExpr("id * 101 AS k", "id AS v")
    out = merge_on_read(base, deletes, upserts, "k")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
