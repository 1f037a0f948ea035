"""triangle_participation: degree-ordered node-iterator triangle
counting (operators/graph.py)."""

import itertools

import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.graph import triangle_participation


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-triangles")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _brute(edges):
    nodes = sorted({n for e in edges for n in e})
    eset = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    part = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            (a, b) in eset
            and tuple(sorted((b, c))) in eset
            and tuple(sorted((a, c))) in eset
        ):
            part[a] += 1
            part[b] += 1
            part[c] += 1
    return {n: c for n, c in part.items() if c}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(df).collect()
    }


def test_k4_every_node_in_three(spark):
    k4 = list(itertools.combinations(range(4), 2))
    assert _run(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_star_has_no_triangles(spark):
    star = [(0, i) for i in range(1, 8)]
    assert _run(spark, star) == {}


def test_duplicates_selfloops_and_both_orientations(spark):
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_hub_plus_random_matches_bruteforce(spark):
    """Power-law-ish: one hub connected to everything plus a random
    sparse layer — the shape the degree orientation exists for."""
    import random

    rng = random.Random(11)
    edges = [(0, i) for i in range(1, 30)]
    edges += [
        (rng.randrange(1, 30), rng.randrange(1, 30)) for _ in range(60)
    ]
    assert _run(spark, edges) == _brute(edges)


def test_string_nodes(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "a string, b string"
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(df).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1}
