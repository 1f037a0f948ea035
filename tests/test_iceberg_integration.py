"""Real-Iceberg integration test behind the capability probe
(sources/sinks.iceberg_available). This container ships no
iceberg-spark-runtime jar, so the test SKIPS cleanly here; the day a
runtime jar appears on the classpath it verifies the genuine
write_pages_iceberg path end to end — native day()/bucket() partition
transforms, readback row parity, and partition pruning on a warc_ts
range predicate — so the "swap one writer call" claim in
sources/sinks.py is checked, not asserted.

The emulated-Parquet layout (write_pages_partitioned) is covered
unconditionally in tests/test_sinks_skew.py; this file covers only the
branch that cannot execute without the jar.
"""

import pytest
from pyspark.sql import functions as F

from q_digest_spark.sources.sinks import iceberg_available, write_pages_iceberg
from q_digest_spark.sources.webpages import generate_webpages


def _iceberg_ready(spark) -> bool:
    return iceberg_available(spark)


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    """Configure a session-local Iceberg hadoop catalog (catalogs are
    resolved lazily, so setting the conf on a live session works)."""
    if not _iceberg_ready(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.it_cat", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_cat.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_cat.warehouse", str(tmp_path / "wh"))
    yield "it_cat"


def test_write_pages_iceberg_roundtrip_and_pruning(spark, iceberg_catalog):
    pages = generate_webpages(spark, 500, n_partitions=4)
    table = f"{iceberg_catalog}.db.pages"
    write_pages_iceberg(pages, table, n_buckets=8)

    back = spark.table(table)
    assert back.count() == 500
    # byte-identical columns survive the round trip
    a = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    b = {r["url"]: r["text"] for r in back.select("url", "text").collect()}
    assert a == b

    # partition pruning: a one-day warc_ts range must scan fewer
    # files than the full table (native day() transform)
    days = [
        r["d"]
        for r in back.select(F.to_date("warc_ts").alias("d")).distinct().collect()
    ]
    assert len(days) > 1, "fixture must span multiple days to test pruning"
    one_day = back.where(F.to_date("warc_ts") == days[0])
    assert 0 < len(one_day.inputFiles()) < len(back.inputFiles())


def test_iceberg_probe_skips_cleanly_without_jar(spark):
    """The probe itself must never raise — on this container it
    reports False and write_pages_iceberg refuses with a clear error
    instead of a classpath stack trace."""
    if _iceberg_ready(spark):
        pytest.skip("jar present — covered by the roundtrip test")
    pages = generate_webpages(spark, 10, n_partitions=1)
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        write_pages_iceberg(pages, "nope.db.pages")
