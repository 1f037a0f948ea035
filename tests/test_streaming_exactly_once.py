"""Kill/restart semantics of the idempotent exactly-once sink
(streaming/exactly_once.py), mirroring test shape of the batch
resumable checkpoint: a run dies in the at-least-once window (data
written, commit marker not), the restart replays the batch, and the
final table equals the plain batch aggregate — no duplicates, no
loss. Plus the two idempotence paths the end-to-end run can't see:
replayed-committed-batch skip and orphaned-data invisibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from q_digest_spark.streaming.exactly_once import (
    IdempotentParquetSink,
    run_stream_to_sink,
)

SF = "/root/testdata/sf0.001"


def _staged(spark, tmp_path, n_files=8):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select("ts", "event_type")
    )
    staging = str(tmp_path / "staging")
    ev.repartition(n_files).write.mode("overwrite").parquet(staging)
    return staging, spark.read.parquet(staging).schema


def _stream(spark, staging, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )


def _counts(bdf):
    return bdf.groupBy(
        F.date_trunc("day", F.col("ts")).cast("timestamp").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))


def test_crash_between_write_and_commit_then_restart(spark, tmp_path):
    staging, schema = _staged(spark, tmp_path)
    sink = IdempotentParquetSink(str(tmp_path / "table"))
    ckpt = str(tmp_path / "ckpt")

    sink.fail_before_commit_of = 1
    with pytest.raises(Exception):
        run_stream_to_sink(_stream(spark, staging, schema), sink, ckpt, _counts)
    # batch 0 committed, batch 1's data orphaned without a marker
    assert sink.committed_ids() == [0]
    assert os.path.exists(os.path.join(sink.data_dir, "batch=1"))
    assert sink.metrics["written"] == 1

    run_stream_to_sink(_stream(spark, staging, schema), sink, ckpt, _counts)
    # 8 files / 2 per trigger = 4 batches; restart replayed batch 1
    # over its orphaned data (recovered), then drained 2 and 3
    assert sink.committed_ids() == [0, 1, 2, 3]
    assert sink.metrics["recovered"] == 1
    assert sink.metrics["written"] == 4

    got = {
        (r["day"], r["event_type"]): int(r["n"])
        for r in sink.committed(spark)
        .groupBy("day", "event_type")
        .agg(F.sum("c").cast("long").alias("n"))
        .collect()
    }
    want = {
        (r["day"], r["event_type"]): int(r["n"])
        for r in spark.read.parquet(staging)
        .groupBy(
            F.date_trunc("day", F.col("ts")).cast("timestamp").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want  # exactly-once: neither duplicated nor lost

    # lineage metrics: one record per committed batch, rows + wall time
    lin = sink.lineage()
    assert [m["batch_id"] for m in lin] == [0, 1, 2, 3]
    assert all(m["rows"] > 0 and m["write_sec"] >= 0 for m in lin)


def test_replayed_committed_batch_is_skipped(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "table"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.write_batch(df, 0)
    n0 = sink.committed(spark).count()
    sink.write_batch(df.union(df), 0)  # replay with different content
    assert sink.metrics["skipped"] == 1
    assert sink.committed(spark).count() == n0  # first commit wins


def test_orphaned_uncommitted_data_is_invisible(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "table"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    sink.write_batch(df, 0)
    # a crashed attempt's data dir with no marker
    df.write.mode("overwrite").parquet(os.path.join(sink.data_dir, "batch=9"))
    assert sink.committed_ids() == [0]
    assert sink.committed(spark).count() == 1
