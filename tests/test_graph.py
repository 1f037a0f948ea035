"""Connected components / dedup clustering (operators/graph.py):
min-label propagation with pointer jumping vs a local union-find
oracle, including the long-chain case that proves the O(log diameter)
round bound, and the end-to-end cluster-survivor semi-join.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.graph import (
    connected_components,
    dedup_cluster_survivors,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_cc_two_components_and_isolated_selfloop(spark):
    _check(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])


def test_cc_clique_and_chain_mix(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique
    edges += [(100 + i, 101 + i) for i in range(10)]  # chain
    edges += [(5, 100)]  # bridge clique->chain
    _check(spark, edges)


def test_cc_long_chain_logarithmic_rounds(spark):
    """A 4000-node path has diameter 3999: naive min-propagation
    needs ~4000 rounds; pointer jumping must close it inside the
    default max_iter=25 (~log2 bound)."""
    edges = [(i, i + 1) for i in range(4000)]
    df = spark.createDataFrame(edges, "a long, b long").repartition(8)
    got = connected_components(df)
    assert got.select(F.countDistinct("component")).collect()[0][0] == 1
    assert got.count() == 4001
    assert got.agg(F.min("component"), F.max("component")).collect()[0] == (0, 0)


def test_cc_random_graph_vs_union_find(spark):
    rng = np.random.RandomState(42)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, 1500, size=(1200, 2))
    ]
    _check(spark, edges)


def test_cc_orientation_and_duplicate_edges_irrelevant(spark):
    base = [(1, 2), (3, 2), (4, 5)]
    noisy = base + [(b, a) for a, b in base] + base
    df1 = spark.createDataFrame(base, "a long, b long")
    df2 = spark.createDataFrame(noisy, "a long, b long")
    c1 = sorted(map(tuple, connected_components(df1).collect()))
    c2 = sorted(map(tuple, connected_components(df2).collect()))
    assert c1 == c2


def test_cc_max_iter_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], "a long, b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


def test_dedup_cluster_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {0,1,2} (transitive via 0-1,1-2), {5,7}; others untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 7)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in dedup_cluster_survivors(docs, pairs).collect()
    }
    assert kept == {0, 3, 4, 5, 6, 8, 9}


def test_cc_cleans_superseded_spills(spark, tmp_path):
    """Iterative rounds must not accumulate one spill directory per
    round for the session lifetime: superseded label spills (and the
    edge spill) are deleted as soon as the next round's convergence
    count has consumed them."""
    import glob
    import tempfile

    before = set(glob.glob(f"{tempfile.gettempdir()}/qds_cc_*"))
    edges = [(i, i + 1) for i in range(500)]
    df = spark.createDataFrame(edges, "a long, b long").repartition(4)
    got = connected_components(df)
    assert got.count() == 501  # materialize the final plan
    after = set(glob.glob(f"{tempfile.gettempdir()}/qds_cc_*")) - before
    # only the FINAL label spill may remain (the returned plan reads it)
    assert len(after) <= 1, after


def test_spill_conf_dir_used(spark, tmp_path):
    from pyspark.sql import functions as F

    from q_digest_spark.operators._spill import cleanup_spill, spill_parquet

    spark.conf.set("spark.qds.spill.dir", str(tmp_path))
    try:
        out = spill_parquet(spark.range(10), "qds_conftest_")
        assert out.count() == 10
        spilled = list(tmp_path.glob("qds_conftest_*"))
        assert len(spilled) == 1, spilled
        cleanup_spill(out)
        assert not list(tmp_path.glob("qds_conftest_*"))
    finally:
        spark.conf.unset("spark.qds.spill.dir")


# ---------------------------------------------------------------- pagerank


def _pagerank_oracle(edges, iters=3, damping=0.85):
    """Dense numpy power iteration with the same fixed-iteration,
    dangling-mass-evaporates semantics as operators/graph.pagerank."""
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in edges:
            nxt[idx[d]] += damping * pr[idx[s]] / outdeg[s]
        pr = nxt
    return {nodes[i]: pr[i] for i in range(n)}


def test_pagerank_matches_dense_oracle(spark):
    from q_digest_spark.operators.graph import pagerank

    # hub-and-spoke + a cycle + a dangling sink + parallel edges
    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("a", "sink"), ("b", "sink"),
        ("a", "hub"),  # parallel edge: counts twice in outdeg + inflow
    ]
    df = spark.createDataFrame(edges, "src string, dst string").repartition(4)
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    want = _pagerank_oracle(edges, iters=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # sink is dangling: its mass evaporates, so total < 1 but every
    # node keeps at least the teleport floor
    assert sum(got.values()) < 1.0
    assert all(v >= (1 - 0.85) / len(want) - 1e-15 for v in got.values())


def test_pagerank_authority_ordering(spark):
    from q_digest_spark.operators.graph import pagerank

    # everyone cites 'star'; star cites one page back
    edges = [(f"p{i}", "star") for i in range(8)] + [("star", "p0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    assert got["star"] == max(got.values())
    assert got["p0"] > got["p1"]  # the only back-cited page beats peers
    want = _pagerank_oracle(edges, iters=3)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_pagerank_empty_and_null_edges(spark):
    from q_digest_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    withnull = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None)], "src string, dst string"
    )
    got = {r["node"]: r["pr"] for r in pagerank(withnull, iters=1).collect()}
    assert set(got) == {"a", "b"}


def test_kcore_planted(spark):
    from q_digest_spark.operators.graph import kcore

    # K4 clique {1,2,3,4} (3-core) + a pendant path 4-5-6 that peels
    # away in two rounds + a duplicate/self-loop to test canonicalizing
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (6, 6), (2, 1),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        int(r["node"]): r["core_degree"]
        for r in kcore(df, "a", "b", k=3).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_and_total_collapse(spark):
    from q_digest_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    assert kcore(df, "a", "b", k=2).count() == 0  # path has no 2-core
    empty = spark.createDataFrame([], "a long, b long")
    assert kcore(empty, "a", "b", k=2).count() == 0


def test_kcore_oracle_unroll_covers_fixture_fixpoint():
    """The kcore_documents DuckDB oracle unrolls 12 peel rounds while
    the operator peels to fixpoint — they agree only if every fixture
    converges within the unroll. Simulate the deterministic citation
    graph at EVERY doc count present under /root/testdata (derived
    from disk, so a new scale factor is re-checked automatically) and
    pin rounds <= 6 (half the unroll, alarm margin)."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from __spark_entry__ import _KCORE_GENS

    doc_counts = sorted(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob("/root/testdata/sf*/documents.parquet")
    )
    assert doc_counts, "no documents fixtures found under /root/testdata"
    assert 500 in doc_counts  # sf0.01, the driver's grading scale

    for n_docs in doc_counts:
        edges = set()
        for i in range(n_docs):
            for a, b in _KCORE_GENS[: 1 + i % 4]:
                j = (a * i + b) % n_docs
                if i != j:
                    edges.add((min(i, j), max(i, j)))
        adj = collections.defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        rounds = 0
        while True:
            dead = [x for x, s in adj.items() if len(s) < 4]
            if not dead:
                break
            rounds += 1
            for x in dead:
                for y in adj[x]:
                    if y in adj:
                        adj[y].discard(x)
                del adj[x]
        assert rounds <= 6, (n_docs, rounds)


def test_bfs_levels_planted(spark):
    from q_digest_spark.operators.graph import bfs_levels

    # path 0-1-2-3-4, triangle 10-11-12 reachable only via 4-10,
    # island 99-100 unreachable; duplicate + reversed edges collapse
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 10),
        (10, 11), (11, 12), (12, 10), (99, 100), (1, 0), (2, 1),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        int(r["node"]): r["level"]
        for r in bfs_levels(df, seeds, "a", "b", max_levels=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 10: 5, 11: 6, 12: 6}
    # truncation at max_levels is exact, not approximate
    got2 = {
        int(r["node"]): r["level"]
        for r in bfs_levels(df, seeds, "a", "b", max_levels=2).collect()
    }
    assert got2 == {0: 0, 1: 1, 2: 2}


def test_bfs_levels_multi_seed_and_degenerate(spark):
    from q_digest_spark.operators.graph import bfs_levels

    df = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        int(r["node"]): r["level"]
        for r in bfs_levels(df, seeds, "a", "b", max_levels=3).collect()
    }
    # two seeds expand independently; min distance wins by construction
    assert got == {1: 0, 4: 0, 2: 1, 5: 1, 3: 2}
    empty_seeds = spark.createDataFrame([], "node long")
    assert bfs_levels(df, empty_seeds, "a", "b").count() == 0
    # level 0 only
    got0 = bfs_levels(df, seeds, "a", "b", max_levels=0).collect()
    assert {int(r["node"]) for r in got0} == {1, 4}
    assert all(r["level"] == 0 for r in got0)


def test_diameter_oracle_unroll_covers_fixture_eccentricity():
    """The diameter_sweep_docs oracle unrolls 12 BFS rounds per sweep
    while the operator runs to frontier exhaustion — they agree only
    if both sweeps' eccentricities fit the unroll. Simulate the
    double sweep at EVERY doc count on disk and pin ecc <= 9 (margin
    of 3 below the unroll)."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from __spark_entry__ import _KCORE_GENS

    doc_counts = sorted(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob("/root/testdata/sf*/documents.parquet")
    )
    assert 500 in doc_counts
    for n in doc_counts:
        adj = collections.defaultdict(set)
        for gi, (a, b) in enumerate(_KCORE_GENS):
            for i in range(n):
                if i % 4 >= gi:
                    j = (a * i + b) % n
                    if i != j:
                        adj[i].add(j)
                        adj[j].add(i)

        def sweep(seed):
            level = {seed: 0}
            frontier = {seed}
            lvl = 0
            while frontier:
                lvl += 1
                nxt = {
                    y for x in frontier for y in adj[x] if y not in level
                }
                for y in nxt:
                    level[y] = lvl
                frontier = nxt
            return level

        l1 = sweep(min(adj))
        ecc1 = max(l1.values())
        far = min(x for x, v in l1.items() if v == ecc1)
        l2 = sweep(far)
        ecc2 = max(l2.values())
        assert ecc1 <= 9 and ecc2 <= 9, (n, ecc1, ecc2)


def test_clustering_coefficients_exact(spark):
    """Hand-checkable graph: K4 plus a pendant. K4 interior nodes sit
    in 3 triangles each with deg 3 -> cc = 1; the node also touching
    the pendant has deg 4, tri 3 -> cc = 2*3/(4*3) = 0.5; the pendant
    has deg 1 -> excluded (cc undefined below deg 2)."""
    from q_digest_spark.operators.graph import clustering_coefficients

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
        for r in clustering_coefficients(df).collect()
    }
    assert got[1] == (3, 3, 1000000)
    assert got[2] == (3, 3, 1000000)
    assert got[3] == (3, 3, 1000000)
    assert got[4] == (4, 3, 500000)
    assert 5 not in got  # deg 1: undefined, excluded


def test_clustering_coefficients_triangle_free(spark):
    """A star has deg >= 2 at the hub but zero triangles: cc_ppm must
    be 0 (NULL-free contract), leaves excluded."""
    from q_digest_spark.operators.graph import clustering_coefficients

    edges = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert set(got) == {0}
    assert got[0]["n_triangles"] == 0 and got[0]["cc_ppm"] == 0


def test_link_prediction_scores_exact(spark):
    """Path 1-2-3 plus 3-4: pair (1,3) is adjacent? no — edges are
    (1,2),(2,3),(3,4): candidates are (1,3) via z=2 and (2,4) via
    z=3; deg(2)=2, deg(3)=2 -> ra_ppm 500000 each. The adjacent pair
    (2,3) must never appear."""
    from q_digest_spark.operators.graph import link_prediction_scores

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): (r["cn"], r["ra_ppm"])
        for r in link_prediction_scores(df).collect()
    }
    assert got == {(1, 3): (1, 500000), (2, 4): (1, 500000)}


def test_link_prediction_anti_join_and_cn(spark):
    """C4 with one diagonal: square 1-2-3-4-1 plus edge (1,3). The
    only non-adjacent pair is (2,4), with common neighbors {1, 3}
    (cn=2); deg(1)=deg(3)=3 -> ra_ppm = 2 * (1000000 div 3) =
    666666. Pairs (1,3) etc. are adjacent and excluded."""
    from q_digest_spark.operators.graph import link_prediction_scores

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): (r["cn"], r["ra_ppm"])
        for r in link_prediction_scores(df).collect()
    }
    assert got == {(2, 4): (2, 666666)}


def test_link_prediction_center_degree_cap(spark):
    """max_center_degree drops wedges whose CENTER is a hub: star
    0-{1..5} has every candidate pair going through hub 0 (deg 5);
    capping at 4 removes them all."""
    from q_digest_spark.operators.graph import link_prediction_scores

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a long, b long"
    )
    assert (
        link_prediction_scores(df, max_center_degree=4).count() == 0
    )
    assert (
        link_prediction_scores(df).count() == 10
    )  # C(5,2) leaf pairs


def test_ktruss_hand_graph(spark):
    """K5 plus a pendant triangle: the 4-truss of K5∪{triangle} is
    exactly K5 (every K5 edge in 3 triangles inside K5; the pendant
    triangle's edges have support 1 and peel)."""
    from q_digest_spark.operators.graph import ktruss

    k5 = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    extra = [(5, 6), (5, 7), (6, 7)]
    df = spark.createDataFrame(k5 + extra, "a long, b long")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss(df, k=4).collect()
    }
    assert set(got) == set(k5)
    assert all(c == 3 for c in got.values())


def test_ktruss_peels_cascade(spark):
    """Diamond (K4 minus an edge): every edge has support 1, so the
    4-truss is empty even though two triangles exist — peeling must
    cascade, not just filter once... actually all supports are < 2
    in round one; use k=3: every edge in >= 1 triangle survives."""
    from q_digest_spark.operators.graph import ktruss

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    assert ktruss(df, k=4).count() == 0
    got3 = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss(df, k=3).collect()
    }
    assert set(got3) == set(edges)


def test_ktruss_rounds_guard_all_fixtures():
    """The graded oracle unrolls _KTRUSS_ROUNDS peel rounds; every sf
    dir on disk must converge within that budget (the parameterized
    guard pattern — a new scale factor re-checks automatically)."""
    import collections
    import glob

    import duckdb

    from __spark_entry__ import _KTRUSS_ROUNDS

    con = duckdb.connect()
    for d in sorted(glob.glob("/root/testdata/sf*")):
        edges = con.execute(
            f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                 FROM '{d}/lineitem.parquet' WHERE l_quantity >= 40)
              SELECT a.l_partkey, b.l_partkey FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey GROUP BY 1, 2"""
        ).fetchall()
        E = set(edges)
        rounds = 0
        while True:
            adj = collections.defaultdict(set)
            for u, v in E:
                adj[u].add(v)
                adj[v].add(u)
            dead = [(u, v) for u, v in E if len(adj[u] & adj[v]) < 2]
            rounds += 1
            if not dead:
                break
            E -= set(dead)
        assert rounds <= _KTRUSS_ROUNDS, (d, rounds)
