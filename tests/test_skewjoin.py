"""Salted skew join (operators/skewjoin.py): row-identity with the
plain join, hot-key detection, salt distribution of the hot reducer.
"""

import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.skewjoin import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 7 holds 20k rows; 100 cold keys hold ~40 each
    fact = (
        spark.range(24_000)
        .select(
            F.when(F.col("id") < 20_000, F.lit(7))
            .otherwise(F.pmod(F.col("id"), F.lit(100)) + 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        .repartition(16)
    )
    dim = spark.createDataFrame(
        [(7, "hot")] + [(100 + i, f"cold{i}") for i in range(100)],
        "k long, name string",
    )
    return fact, dim


def test_hot_key_detection(spark, skewed):
    fact, _ = skewed
    assert hot_keys(fact, "k", 1000) == [7]
    assert set(hot_keys(fact, "k", 10)) == {7} | {100 + i for i in range(100)}


def test_salted_join_row_identical_to_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", salt=8, hot_threshold=1000)
    assert sorted(c for c in salted.columns) == sorted(c for c in plain.columns)
    a = plain.groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    b = salted.groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_no_hot_keys_passthrough(spark, skewed):
    _, dim = skewed
    fact = spark.range(1000).select(
        (F.pmod(F.col("id"), F.lit(100)) + 100).alias("k"), F.col("id").alias("v")
    )
    out = salted_join(fact, dim, "k", hot_threshold=1000)
    assert out.count() == 1000


def test_salted_join_spreads_hot_partition(spark, skewed):
    """The hot branch must shuffle on (k, __salt) — the salt widens
    the hot key across reducers — and the fact rows must actually use
    more than one salt value. (AQE coalesces this tiny fixture's
    OUTPUT partitions, so spark_partition_id on the result is not a
    valid probe; the join key is.)"""
    fact, dim = skewed
    salted = salted_join(fact, dim, "k", salt=8, hot_threshold=1000)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, plan
    # the salted fact side really is spread across salt values
    from q_digest_spark.operators.skewjoin import hot_keys

    hot = hot_keys(fact, "k", 1000)
    f_hot = fact.where(F.col("k").isin(hot)).withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    assert f_hot.select("__salt").distinct().count() > 4


def test_salted_join_auto_threshold(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, "k")  # auto: 5x mean floor 1000
    assert out.count() == fact.join(dim, "k").count()
