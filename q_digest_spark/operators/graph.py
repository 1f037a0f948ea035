"""Distributed connected components for dedup clustering.

Near-dup detection (dedup.py, similarity.py) emits PAIRS; turning a
corpus into a deduplicated training set needs the transitive closure
of those pairs — duplicate CLUSTERS — so exactly one canonical
survivor is kept per cluster (A~B and B~C must collapse to one doc
even when A~C was never emitted).

The algorithm is min-label propagation with pointer jumping (the
"hash-to-min" family: Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds", ICDE 2013 — public literature):
every node starts labeled with itself; each round every node adopts
the minimum label in its closed neighborhood, then pointer-jumps
(label := label's label), which contracts chains geometrically, so
rounds are O(log diameter) rather than O(diameter). Every round is
plain DataFrame shuffles — join on node id + groupBy min — and the
label table is spilled to parquet per round (operators/_spill.py) so
the iterative plan never accumulates lineage. Nothing row-scaled
ever reaches the driver; the per-round convergence check is a
count() of changed labels.

At 100 TB the edge list from near-dup detection is a tiny fraction of
the corpus (pairs, not rows), so the whole closure runs on the pair
table; only the final semi-join touches full document rows.

No reference counterpart: the C reference (qcore.c) has no graph or
dedup layer at all — this is engine-native functionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import cleanup_spill, spill_parquet


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    spill_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id of the component.

    ``edges`` is an undirected pair list (each pair in either or both
    orientations; self-loops and duplicates are fine). Runs
    min-label propagation with pointer jumping until a fixpoint
    (checked per round), raising if ``max_iter`` rounds (enough for
    graphs of diameter ~2^25) did not converge. Eager: the closure
    runs at call time; the returned DataFrame reads the final spilled
    label table.
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
    # closed symmetric neighborhood: both orientations + self-loops,
    # deduplicated once up front so every round joins the minimal edge set
    sym = spill_parquet(
        e.select("a", "b")
        .union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(
            e.select(F.col("a"), F.col("a").alias("b"))
            .union(e.select(F.col("b").alias("a"), F.col("b")))
        )
        .distinct(),
        "qds_cc_edges_",
        spill_dir,
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(max_iter):
        # 1. neighborhood min: lbl'(v) = min over closed N(v) of lbl(u)
        #    — spilled ONCE, because the self-join below reads it on
        #    BOTH sides and Spark re-executes an unmaterialized
        #    subplan per join branch (the dominant shuffle would run
        #    twice per round otherwise)
        nm = spill_parquet(
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("lbl")),
            "qds_cc_nm_",
            spill_dir,
        )
        # 2. pointer jump: lbl''(v) = lbl'(lbl'(v)) — contracts chains
        #    geometrically (the label table doubles as the pointer map)
        jumped = (
            nm.alias("x")
            .join(
                nm.select(
                    F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("y"),
                "lbl",
            )
            .select(F.col("node"), F.col("lbl2").alias("lbl"))
        )
        new_labels = spill_parquet(jumped, "qds_cc_labels_", spill_dir)
        cleanup_spill(nm)  # consumed by the new_labels write just above
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        # the change count was the last reader of the previous round's
        # label spill — drop it now instead of at interpreter exit
        # (a long driver session would otherwise hold one dir/round;
        # every spill sits in its own {prefix}{uuid} subdir, so this
        # is safe with an explicit spill_dir too)
        cleanup_spill(labels)
        labels = new_labels
        if changed == 0:
            cleanup_spill(sym)
            return labels.select("node", F.col("lbl").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_cluster_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """One canonical row per duplicate CLUSTER (transitive closure of
    ``pairs``): the min-id member survives, every other cluster member
    is dropped, rows in no pair survive untouched. Full rows move only
    through the final left_anti semi-join — the closure itself runs on
    the (tiny) pair table."""
    comp = connected_components(pairs, src, dst)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
