"""Referential-integrity audit (operators/membership.
referential_orphans): exactness despite the Bloom prefilter, NULL-FK
semantics, empty-parent short-circuit, and FP-immunity under a
deliberately tiny (collision-heavy) filter."""

from pyspark.sql import functions as F

from q_digest_spark.operators.membership import referential_orphans


def _row(df):
    r = df.collect()[0]
    return (r["n_rows"], r["n_keyed"], r["n_orphans"])


def test_clean_relation_has_zero_orphans(spark):
    parent = spark.range(0, 100).select(F.col("id").alias("pk"))
    child = spark.range(0, 300).select((F.col("id") % 100).alias("fk"))
    assert _row(referential_orphans(child, "fk", parent, "pk")) == (300, 300, 0)


def test_planted_orphans_counted_exactly(spark):
    parent = spark.range(0, 100).select(F.col("id").alias("pk"))
    # ids 0..99 match; 100..129 are orphans; 7 NULLs excluded from keyed
    child = spark.range(0, 130).select(
        F.when(F.col("id") % 19 == 3, None)
        .otherwise(F.col("id"))
        .alias("fk")
    )
    n_null = sum(1 for i in range(130) if i % 19 == 3)
    n_orph = sum(1 for i in range(100, 130) if i % 19 != 3)
    assert _row(referential_orphans(child, "fk", parent, "pk")) == (
        130, 130 - n_null, n_orph,
    )


def test_tiny_bloom_fp_heavy_still_exact(spark):
    # 64-bit filter with 200 parent keys: FP rate near 1, so nearly
    # every orphan becomes a probe HIT — the anti-join confirm must
    # still find every one of them.
    parent = spark.range(0, 200).select(F.col("id").alias("pk"))
    child = spark.range(150, 400).select(F.col("id").alias("fk"))
    assert _row(
        referential_orphans(child, "fk", parent, "pk", m_bits=64)
    ) == (250, 250, 200)


def test_empty_parent_all_orphans(spark):
    parent = spark.range(0, 10).where(F.col("id") < 0).select(
        F.col("id").alias("pk")
    )
    child = spark.range(0, 25).select(F.col("id").alias("fk"))
    assert _row(referential_orphans(child, "fk", parent, "pk")) == (25, 25, 25)
