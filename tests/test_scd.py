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
