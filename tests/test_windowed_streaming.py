"""Event-time windowed sketch quantiles: watermark finalization,
in-watermark late rows folded, beyond-watermark rows dropped."""

import os
import shutil
import tempfile
from datetime import datetime
from functools import partial

import numpy as np
from pyspark.sql import functions as F

from q_digest_spark.sketches import QDigest, qdigest_from_bytes
from q_digest_spark.streaming.windowed import windowed_streaming_quantiles


def _ts(minute, second=0):
    return datetime(2025, 1, 1, 10, minute, second)


def test_windowed_quantiles_with_late_data(spark):
    d = tempfile.mkdtemp(prefix="qds_win_")
    src = os.path.join(d, "in")
    os.makedirs(src)
    ckpt = os.path.join(d, "ckpt")
    try:
        def write_file(name, rows):
            spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.parquet(
                os.path.join(src, name)
            )

        # window [10:00, 10:10), 5-minute watermark
        w1 = [(_ts(m % 10), int(v)) for m, v in enumerate(range(100, 160))]
        write_file("f0", w1)

        stream = spark.readStream.schema("ts timestamp, v long").parquet(src + "/*")
        out = windowed_streaming_quantiles(
            stream, "ts", "v", partial(QDigest, 0, 14), qdigest_from_bytes,
            window="10 minutes", watermark="5 minutes",
        )
        q = (
            out.writeStream.format("memory").queryName("win_q")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            # watermark is only ~10:04 — window must still be open
            assert spark.sql("select * from win_q").count() == 0

            # batch 2: rows in the NEXT window (advances the watermark to
            # ~10:07) + one LATE row for window 1 at 10:05:30 — behind
            # max event time but ahead of the 10:04 watermark, so kept
            write_file("f1", [(_ts(12), 1000), (_ts(5, 30), 500)])
            q.processAllAvailable()
            assert spark.sql("select * from win_q").count() == 0  # wm < 10:15

            # batch 3: far-future row pushes watermark past 10:15 ->
            # window 1 finalizes exactly once, late row included
            write_file("f2", [(_ts(30), 2000)])
            q.processAllAvailable()
            rows = spark.sql("select * from win_q").collect()
            assert len(rows) == 1
            r = rows[0]
            assert r["win_start"] == _ts(0) and r["win_end"] == _ts(10)
            assert r["n"] == 61  # 60 on-time + 1 late-within-watermark
            allv = np.sort(np.array([v for _, v in w1] + [500]))
            assert r["p50"] == float(allv[int(np.ceil(0.5 * len(allv))) - 1])

            # batch 4: a hopelessly late row for window 1 (beyond the
            # watermark) must NOT resurrect the finalized window
            write_file("f3", [(_ts(2), 9999)])
            q.processAllAvailable()
            n_w1 = (
                spark.sql("select * from win_q")
                .where(F.col("win_start") == _ts(0))
                .count()
            )
            assert n_w1 == 1
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_windowed_per_key_quantiles(spark):
    d = tempfile.mkdtemp(prefix="qds_wink_")
    src = os.path.join(d, "in")
    os.makedirs(src)
    ckpt = os.path.join(d, "ckpt")
    try:
        def write_file(name, rows):
            spark.createDataFrame(rows, "ts timestamp, lang string, v long").coalesce(
                1
            ).write.parquet(os.path.join(src, name))

        w1 = [(_ts(m % 10), "en", 100 + m) for m in range(40)] + [
            (_ts(m % 10), "de", 900 + m) for m in range(20)
        ]
        write_file("f0", w1)
        stream = spark.readStream.schema("ts timestamp, lang string, v long").parquet(
            src + "/*"
        )
        out = windowed_streaming_quantiles(
            stream, "ts", "v", partial(QDigest, 0, 14), qdigest_from_bytes,
            window="10 minutes", watermark="5 minutes", key_cols=("lang",),
        )
        q = (
            out.writeStream.format("memory").queryName("win_k")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            write_file("f1", [(_ts(30), "en", 1)])  # advance watermark
            q.processAllAvailable()
            rows = {r["lang"]: r for r in spark.sql("select * from win_k").collect()}
            assert set(rows) == {"en", "de"}
            assert rows["en"]["n"] == 40 and rows["de"]["n"] == 20
            assert 900 <= rows["de"]["p50"] < 920
            assert rows["en"]["win_start"] == _ts(0)
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_windowed_all_null_window_does_not_crash(spark):
    """Review regression: a window whose rows are all NULL must not
    kill the query on watermark timeout (empty-sketch guard)."""
    d = tempfile.mkdtemp(prefix="qds_winnull_")
    src = os.path.join(d, "in")
    os.makedirs(src)
    ckpt = os.path.join(d, "ckpt")
    try:
        def write_file(name, rows):
            spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.parquet(
                os.path.join(src, name)
            )

        write_file("f0", [(_ts(1), None), (_ts(2), None)])  # all-null window
        stream = spark.readStream.schema("ts timestamp, v long").parquet(src + "/*")
        out = windowed_streaming_quantiles(
            stream, "ts", "v", partial(QDigest, 0, 14), qdigest_from_bytes,
            window="10 minutes", watermark="1 minute",  # singular unit too
        )
        q = (
            out.writeStream.format("memory").queryName("win_null")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            write_file("f1", [(_ts(40), 7)])  # watermark passes window 1
            q.processAllAvailable()
            write_file("f2", [(_ts(55), 8)])
            q.processAllAvailable()  # no StreamingQueryException
            rows = spark.sql("select * from win_null").collect()
            assert all(r["win_start"] != _ts(0) for r in rows)  # null window absent
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sliding_windows_overlap_and_finalize(spark):
    """slide < window: each row lands in window/slide overlapping
    windows, each finalized independently."""
    d = tempfile.mkdtemp(prefix="qds_winslide_")
    src = os.path.join(d, "in")
    os.makedirs(src)
    ckpt = os.path.join(d, "ckpt")
    try:
        def write_file(name, rows):
            spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.parquet(
                os.path.join(src, name)
            )

        # one row at 10:07 with 10-min windows sliding by 5 min ->
        # belongs to [10:00,10:10) and [10:05,10:15)
        write_file("f0", [(_ts(7), 100)])
        stream = spark.readStream.schema("ts timestamp, v long").parquet(src + "/*")
        out = windowed_streaming_quantiles(
            stream, "ts", "v", partial(QDigest, 0, 14), qdigest_from_bytes,
            window="10 minutes", watermark="1 minute", slide="5 minutes",
        )
        q = (
            out.writeStream.format("memory").queryName("win_slide")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            write_file("f1", [(_ts(40), 1)])  # advance watermark past both
            q.processAllAvailable()
            write_file("f2", [(_ts(55), 1)])
            q.processAllAvailable()
            rows = spark.sql(
                "select * from win_slide where p50 = 100.0"
            ).collect()
            starts = sorted(r["win_start"] for r in rows)
            assert starts == [_ts(0), _ts(5)]
            assert all(r["n"] == 1 for r in rows)
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
