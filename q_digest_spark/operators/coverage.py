"""Greedy maximum-coverage set selection — the submodular
data-mixture primitive (Nemhauser-Wolsey-Fisher 1978: the greedy
sweep is a (1 - 1/e)-approximation, the best possible in polynomial
time): pick k corpora/sources whose union covers the most distinct
vocabulary, the standard shape for "which k crawls/domains should
the next training mix include".

Deterministic and integer-exact: coverage gains are exact distinct
counts; each round's winner is argmax(gain) with the set id as the
tie-break, so the selection sequence is a pure function of the
(set, element) relation.

100-TB shape: the relation is reduced ONCE to distinct
(set, element) pairs (one element-keyed shuffle with map-side
partial dedup) and spilled; each of the k rounds is one
broadcast-able anti-join of that spill against the covered-element
spill (element-keyed, no row-scaled driver traffic) + a per-set
count + a TakeOrdered(1) reduce. Covered elements accumulate in a
parquet spill (operators/_spill.py), so iterative lineage stays
O(1) and a round's state survives executor loss. k is a small
constant (the mixture size), so total work is k passes over the
distinct-pair table — never over the raw corpus.

The matching DuckDB oracle unrolls the same greedy k times over
MATERIALIZED coverage CTEs. No reference counterpart (qcore.c has
no relational layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import cleanup_spill, spill_parquet


def greedy_max_coverage(
    df: DataFrame, set_col: str, elem_col: str, k: int
) -> DataFrame:
    """Greedy max-coverage over the (set, element) relation ``df``
    -> (sel_rank 1..k, ``set_col``, gain, cum_coverage): per round
    the chosen set, how many NEW elements it contributed (exact
    distinct count), and the running union size. Ties break on the
    smallest set id. NULL set/element rows are excluded. Stops
    early when every remaining set has gain 0 (all elements
    covered), so at most min(k, #sets with novel elements) rows.
    """
    pairs = spill_parquet(
        df.where(F.col(set_col).isNotNull() & F.col(elem_col).isNotNull())
        .select(F.col(set_col).alias("s"), F.col(elem_col).alias("e"))
        .distinct(),
        "maxcov_pairs_",
    )

    covered: DataFrame | None = None
    picked: list[tuple[int, object, int, int]] = []
    cum = 0
    for rank in range(1, k + 1):
        remaining = (
            pairs
            if covered is None
            else pairs.join(covered, "e", "left_anti")
        )
        row = (
            remaining.groupBy("s")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("s"))
            .limit(1)
            .collect()
        )
        if not row or int(row[0]["gain"]) == 0:
            break
        win, gain = row[0]["s"], int(row[0]["gain"])
        cum += gain
        picked.append((rank, win, gain, cum))
        if rank == k:
            break
        nxt = spill_parquet(
            (
                pairs.where(F.col("s") == F.lit(win)).select("e")
                if covered is None
                else covered.unionByName(
                    pairs.where(F.col("s") == F.lit(win)).select("e")
                ).distinct()
            ),
            f"maxcov_cov{rank}_",
        )
        if covered is not None:
            cleanup_spill(covered)
        covered = nxt
    if covered is not None:
        cleanup_spill(covered)
    cleanup_spill(pairs)

    spark = df.sparkSession
    set_type = dict(df.dtypes)[set_col]
    return spark.createDataFrame(
        picked,
        f"sel_rank long, {set_col} {set_type}, gain long, cum_coverage long",
    )


def greedy_ratio_coverage(
    df: DataFrame,
    set_col: str,
    elem_col: str,
    cost_df: DataFrame,
    k: int,
    ratio_scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Cost-aware (budgeted) greedy coverage — the cost-benefit
    variant of :func:`greedy_max_coverage` (Khuller-Moss-Naor 1999:
    ratio greedy is the standard heuristic for budgeted max
    coverage): per round pick the set maximizing NEW elements per
    unit cost, for 'which crawls add the most novel content per
    fetched byte'.

    ``cost_df`` carries (``set_col``, cost) with cost a positive
    int64. The public contract ranks by the INTEGER-quantized ratio
    ``ratio_q = (ratio_scale * gain) div cost`` with (gain DESC,
    set id ASC) tie-breaks — pure integer algebra any engine
    reproduces (ratio_scale * gain must stay under 2^63: at the
    default 1e12 scale that bounds gain < 9.2e6 distinct new
    elements per set per round; raise/lower ratio_scale to trade
    resolution for headroom).

    Output: (sel_rank, set, gain, cost, ratio_q, cum_coverage).
    Same plan shape as greedy_max_coverage: distinct pairs spilled
    once, one anti-join + per-set count + broadcast cost join +
    TakeOrdered(1) per round; gain-0 early stop.
    """
    pairs = spill_parquet(
        df.where(F.col(set_col).isNotNull() & F.col(elem_col).isNotNull())
        .select(F.col(set_col).alias("s"), F.col(elem_col).alias("e"))
        .distinct(),
        "ratiocov_pairs_",
    )
    costs = F.broadcast(
        cost_df.select(
            F.col(set_col).alias("s"), F.col("cost").cast("long").alias("cost")
        ).where(F.col("cost") > 0)
    )

    covered: DataFrame | None = None
    picked: list[tuple] = []
    cum = 0
    for rank in range(1, k + 1):
        remaining = (
            pairs if covered is None else pairs.join(covered, "e", "left_anti")
        )
        row = (
            remaining.groupBy("s")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .join(costs, "s")
            .withColumn(
                "ratio_q",
                F.expr(f"CAST(({ratio_scale} * gain) DIV cost AS LONG)"),
            )
            .orderBy(F.desc("ratio_q"), F.desc("gain"), F.asc("s"))
            .limit(1)
            .collect()
        )
        if not row or int(row[0]["gain"]) == 0:
            break
        win, gain = row[0]["s"], int(row[0]["gain"])
        cum += gain
        picked.append(
            (rank, win, gain, int(row[0]["cost"]), int(row[0]["ratio_q"]), cum)
        )
        if rank == k:
            break
        nxt = spill_parquet(
            (
                pairs.where(F.col("s") == F.lit(win)).select("e")
                if covered is None
                else covered.unionByName(
                    pairs.where(F.col("s") == F.lit(win)).select("e")
                ).distinct()
            ),
            f"ratiocov_cov{rank}_",
        )
        if covered is not None:
            cleanup_spill(covered)
        covered = nxt
    if covered is not None:
        cleanup_spill(covered)
    cleanup_spill(pairs)

    spark = df.sparkSession
    set_type = dict(df.dtypes)[set_col]
    return spark.createDataFrame(
        picked,
        f"sel_rank long, {set_col} {set_type}, gain long, cost long, "
        "ratio_q long, cum_coverage long",
    )
