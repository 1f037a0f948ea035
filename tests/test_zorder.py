"""Z-order clustered writes (sources/sinks.py): Morton interleave
correctness and the actual payoff — per-file parquet footer min/max
ranges tight on BOTH dimensions (asserted through DuckDB's
parquet_metadata, i.e. the real stats a scanner would skip on).
"""

import glob
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from q_digest_spark.sources.sinks import write_zordered, zorder_rank, zorder_value


def test_zorder_value_interleaves_bits(spark):
    rows = (
        spark.createDataFrame([(3, 5)], "x long, y long")
        .select(zorder_value("x", "y", bits=4).alias("z"))
        .collect()
    )
    # x=3=0b0011: bits 0,1 -> z positions 0,2 ; y=5=0b0101: bits 0,2
    # -> z positions 1,5 : z = 1 + 4 + 2 + 32 = 39
    assert rows[0]["z"] == 39


def test_zorder_rank_clamps_and_scales(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,)], "v double")
    got = [r["r"] for r in df.select(zorder_rank("v", 0, 100, bits=8).alias("r")).collect()]
    assert got[0] == 0 and got[2] == 255 and got[3] == 0 and got[4] == 255
    assert abs(got[1] - 128) <= 1


def _file_ranges(path_glob, col):
    con = duckdb.connect()
    q = f"""
    SELECT file_name,
           min(TRY_CAST(stats_min_value AS DOUBLE)) AS lo,
           max(TRY_CAST(stats_max_value AS DOUBLE)) AS hi
    FROM parquet_metadata('{path_glob}')
    WHERE path_in_schema = '{col}'
    GROUP BY file_name
    """
    return [(r[1], r[2]) for r in con.execute(q).fetchall()]


def _avg_range(ranges):
    rs = [hi - lo for lo, hi in ranges if lo is not None and hi is not None]
    assert rs
    return sum(rs) / len(rs)


def test_zordered_files_have_tight_ranges_on_both_dims(spark, sf_test, tmp_path):
    ev = (
        spark.read.parquet(f"{sf_test}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
    )
    zpath = str(tmp_path / "z")
    npath = str(tmp_path / "naive")
    write_zordered(ev, zpath, "user_id", "cents", n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(npath)

    for col in ("user_id", "cents"):
        zr = _avg_range(_file_ranges(f"{zpath}/*.parquet", col))
        nr = _avg_range(_file_ranges(f"{npath}/*.parquet", col))
        # every naive file spans ~the full domain; z-ordered files
        # cover small rectangles on BOTH dimensions simultaneously
        assert zr < 0.6 * nr, (col, zr, nr)

    # and the data survives byte-for-byte (same multiset)
    a = spark.read.parquet(zpath).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    b = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
