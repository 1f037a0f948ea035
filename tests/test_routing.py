"""Rendezvous (HRW) hashing (operators/routing.py)."""

import pytest
from pyspark.sql import SparkSession, functions as F

from q_digest_spark.operators.routing import rendezvous_assign


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-routing")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame([(i,) for i in range(500)], "k long")


def _assign(keys, shards):
    return {
        r["k"]: r["shard"]
        for r in rendezvous_assign(keys, "k", shards).collect()
    }


def test_consistency_removing_a_shard_moves_only_its_keys(keys):
    shards = [f"s{i}" for i in range(5)]
    full = _assign(keys, shards)
    without = _assign(keys, shards[:-1])
    for k, s in full.items():
        if s != "s4":
            assert without[k] == s, k  # untouched keys never move


def test_consistency_adding_a_shard_only_steals(keys):
    shards = [f"s{i}" for i in range(4)]
    base = _assign(keys, shards)
    grown = _assign(keys, shards + ["s4"])
    for k, s in grown.items():
        if s != "s4":
            assert base[k] == s, k


def test_balance_roughly_uniform(keys):
    counts = {}
    for s in _assign(keys, [f"s{i}" for i in range(5)]).values():
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == 5
    assert all(50 <= c <= 150 for c in counts.values()), counts


def test_single_shard_and_determinism(spark, keys):
    one = rendezvous_assign(keys, "k", ["only"]).select("shard").distinct()
    assert [r["shard"] for r in one.collect()] == ["only"]
    a = _assign(keys, ["a", "b", "c"])
    b = _assign(keys, ["a", "b", "c"])
    assert a == b


def test_assignment_is_shuffle_free(spark, keys):
    plan = (
        rendezvous_assign(keys, "k", ["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
