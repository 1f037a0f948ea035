"""sliding_window_rows: all trailing windows from the stored daily
sketch table in one distributed pass — parity with per-window direct
merges, window membership, and HLL bit-identity per window."""

import datetime

import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.incremental import (
    merge_sketch_range,
    sliding_window_rows,
    write_daily_sketches,
)
from q_digest_spark.operators.quantiles import RawHLL, raw_hll_from_bytes


@pytest.fixture(scope="module")
def daily_path(spark, sf_test, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("daily") / "hll")
    df = spark.read.parquet(f"{sf_test}/events.parquet").where(
        F.col("ts").isNotNull()
    )
    write_daily_sketches(df, "ts", "user_id", RawHLL, raw_hll_from_bytes, path)
    return path


def test_windows_match_direct_range_merges(spark, daily_path):
    wins = {
        r["win_end"]: bytes(r["sketch"])
        for r in sliding_window_rows(
            spark, daily_path, raw_hll_from_bytes, window_days=3
        ).collect()
    }
    days = sorted(
        r["day"] for r in spark.read.parquet(daily_path).select("day").distinct().collect()
    )
    assert set(wins) == set(days)  # one window per stored day
    for end in days:
        lo = (end - datetime.timedelta(days=2)).isoformat()
        direct = merge_sketch_range(
            spark, daily_path, raw_hll_from_bytes, lo, end.isoformat()
        )
        # HLL state is element-wise max: merge order is irrelevant and
        # the distributed window merge is bit-identical to the direct one
        assert (
            raw_hll_from_bytes(wins[end]).estimate() == direct.estimate()
        ), end


def test_window_rows_counts(spark, daily_path):
    daily = {
        r["day"]: r["rows"]
        for r in spark.read.parquet(daily_path).select("day", "rows").collect()
    }
    wins = sliding_window_rows(
        spark, daily_path, raw_hll_from_bytes, window_days=3
    ).collect()
    for r in wins:
        expect = sum(
            daily.get(r["win_end"] - datetime.timedelta(days=i), 0)
            for i in range(3)
        )
        assert r["rows"] == expect


def test_window_of_one_day_equals_daily(spark, daily_path):
    wins = {
        r["win_end"]: bytes(r["sketch"])
        for r in sliding_window_rows(
            spark, daily_path, raw_hll_from_bytes, window_days=1
        ).collect()
    }
    for r in spark.read.parquet(daily_path).collect():
        assert (
            raw_hll_from_bytes(wins[r["day"]]).estimate()
            == raw_hll_from_bytes(bytes(r["sketch"])).estimate()
        )
