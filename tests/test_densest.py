"""Densest-subgraph parallel peel (operators/densest.py): planted
structure, degenerate inputs, and the oracle-unroll guard for the
graded densest_subgraph_docs query (the DuckDB oracle unrolls 8 peel
rounds; every fixture on disk must reach the empty fixpoint within
that, pinned at <= 4 for alarm margin)."""

from __future__ import annotations

import pytest


def _peel_sim(edges, eps_tenths=2, max_rounds=64):
    """Driver-free replica of densest_subgraph_rounds for guards."""
    thr = 2 * (10 + eps_tenths)
    e = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    rounds = []
    rnd = 0
    while e and rnd < max_rounds:
        deg: dict = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        nv, ne = len(deg), len(e)
        rounds.append((rnd, nv, ne))
        alive = {x for x, d in deg.items() if d * nv * 10 > thr * ne}
        e = {(u, v) for u, v in e if u in alive and v in alive}
        rnd += 1
    return rounds


def test_densest_planted_clique(spark):
    """K6 clique + a 12-node path: round 0 is the whole graph, the
    best round is the one where the path has peeled away and the
    clique (density 2.5) survives; duplicates/self-loops/reversed
    edges canonicalize away."""
    from q_digest_spark.operators.densest import densest_subgraph_rounds

    clique = [
        (i, j) for i in range(100, 106) for j in range(100, 106) if i < j
    ]
    path = [(i, i + 1) for i in range(12)]
    noise = [(100, 100), (101, 100), (0, 1)]  # self-loop, reverse, dup
    df = spark.createDataFrame(clique + path + noise, "a long, b long")
    rows = sorted(
        densest_subgraph_rounds(df, "a", "b", eps_tenths=2).collect(),
        key=lambda r: r["round"],
    )
    assert rows[0]["round"] == 0
    assert rows[0]["n_nodes"] == 19 and rows[0]["n_edges"] == 27
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    # the surviving best round is exactly the K6: density 15/6 = 2.5
    assert best[0]["n_nodes"] == 6 and best[0]["n_edges"] == 15
    assert best[0]["density_ppm"] == 2_500_000
    # matches the pure-python replica round for round
    sim = _peel_sim(clique + path + noise)
    assert [(r["round"], r["n_nodes"], r["n_edges"]) for r in rows] == sim


def test_densest_empty_and_single_edge(spark):
    from q_digest_spark.operators.densest import densest_subgraph_rounds

    empty = spark.createDataFrame([], "a long, b long")
    assert densest_subgraph_rounds(empty, "a", "b").count() == 0
    one = spark.createDataFrame([(1, 2)], "a long, b long")
    rows = densest_subgraph_rounds(one, "a", "b").collect()
    assert [(r["round"], r["n_nodes"], r["n_edges"], r["is_best"])
            for r in rows] == [(0, 2, 1, True)]


def test_densest_eps_validation(spark):
    from q_digest_spark.operators.densest import densest_subgraph_rounds

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        densest_subgraph_rounds(df, "a", "b", eps_tenths=0)


def test_densest_oracle_unroll_covers_fixture_fixpoint():
    """The densest_subgraph_docs DuckDB oracle unrolls 8 peel rounds
    while the operator peels to the empty fixpoint — they agree only
    if every fixture converges within the unroll. Simulate the
    nested-density fixture graph at EVERY doc count present under
    /root/testdata (derived from disk, so a new scale factor is
    re-checked automatically) and pin rounds <= 4 (half the unroll,
    alarm margin). Also pin that the planted clique is the best round
    at every scale."""
    import glob

    import pyarrow.parquet as pq

    from __spark_entry__ import _KCORE_GENS

    doc_counts = sorted(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob("/root/testdata/sf*/documents.parquet")
    )
    assert doc_counts, "no documents fixtures found under /root/testdata"
    assert 500 in doc_counts  # sf0.01, the driver's grading scale

    for n in doc_counts:
        edges = set()
        for gi, (a, b) in enumerate(_KCORE_GENS):
            for i in range(n):
                if i % 4 >= gi:
                    j = (a * i + b) % n
                    if i != j:
                        edges.add((min(i, j), max(i, j)))
        q = max(n // 32, 1)
        cl = [i for i in range(n) if i % q == 0]
        for x in range(len(cl)):
            for y in range(x + 1, len(cl)):
                edges.add((cl[x], cl[y]))
        p = max(n // 64, 1)
        md = [i for i in range(n) if i % p == 1]
        if len(md) > 1:
            for x in range(len(md)):
                for s in range(1, 7):
                    u, v = md[x], md[(x + s) % len(md)]
                    if u != v:
                        edges.add((min(u, v), max(u, v)))
        rounds = _peel_sim(edges)
        assert 0 < len(rounds) <= 4, (n, len(rounds))
        best = max(
            range(len(rounds)),
            key=lambda i: (rounds[i][2] / rounds[i][1], -i),
        )
        # the surviving best round is the planted clique
        assert rounds[best][1] == len(cl), (n, rounds)
