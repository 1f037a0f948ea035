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


def test_hits_integer_matches_bruteforce(spark):
    from q_digest_spark.operators.graph import hits_scores

    edges = [
        (1, "x"), (1, "y"), (2, "x"), (3, "x"), (3, "z"), (3, "z"),
    ]
    df = spark.createDataFrame(edges, "c long, p string")
    h, a = hits_scores(df, "c", "p", iters=2)
    got_a = {r["node"]: r["a"] for r in a.collect()}
    got_h = {r["node"]: r["h"] for r in h.collect()}

    # by hand: distinct edges {1x,1y,2x,3x,3z}
    # a1: x=3, y=1, z=1 ; h1: 1=a(x)+a(y)=4, 2=3, 3=a(x)+a(z)=4
    # a2: x=h1+h2+h3=11, y=h1=4, z=h3=4
    # h2: 1=a2(x)+a2(y)=15, 2=11, 3=a2(x)+a2(z)=15
    assert got_a == {"x": 11, "y": 4, "z": 4}
    assert got_h == {1: 15, 2: 11, 3: 15}
