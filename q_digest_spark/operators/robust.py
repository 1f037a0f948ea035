"""Robust two-sample statistics: the Hodges–Lehmann shift estimator.

HL(X, Y) = median{ x_i − y_j } over ALL n1·n2 pairs (Hodges &
Lehmann, Ann. Math. Stat. 1963) — the location-shift effect size that
pairs with the Mann-Whitney U test (operators/events.py grades MWU;
this supplies the magnitude to MWU's verdict). Naively it is a
quadratic cross join of fact rows; this operator computes it EXACTLY
as the weighted median of the DIFFERENCE OF VALUE HISTOGRAMS:

    rollup X and Y to (value, count) — one map-side-combined shuffle
    each, the same rollup every quantile oracle here uses;
    cross the two HISTOGRAMS (|Vx| × |Vy| rows, not n1 × n2): each
    (vx, vy) pair carries weight cx·cy;
    weighted lower median over d = vx − vy by ordered cumsum.

The histograms are spilled (operators/_spill.py) so Catalyst sees
real sizes and broadcasts the smaller side — the cross is a
BroadcastNestedLoopJoin over two tiny tables, never a fact-row
cartesian. The value domain is pre-quantized by the caller (integer
units, e.g. cents div 100), which is what bounds |Vx|·|Vy|; the
estimator is then the exact HL of the QUANTIZED values — the
documented contract, reproducible bit-for-bit in SQL.

Integer domain notes: quantized units MUST be non-negative under
engine-portable integer division (Python // floors, SQL // truncates
— CLAUDE.md signed-quantization rule binds on the caller's quantizer,
not here: d = vx − vy may be negative but is never divided). Pair
weights cx·cy and their running sum reach n1·n2: the cumsum runs in
decimal(38,0) so a 10^12-row table cannot overflow the int64 rank.

Median convention: LOWER median — the smallest d whose cumulative
pair weight reaches ceil(N/2), N = n1·n2 — total and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._spill import spill_parquet


def hodges_lehmann_shift(
    df_x: DataFrame,
    df_y: DataFrame,
    value_col: str = "v",
) -> DataFrame:
    """One row: (hl_shift bigint, n_pairs bigint) — the exact lower-
    median of all pairwise differences x − y of the integer column
    ``value_col`` (pre-quantized by the caller)."""
    hx = spill_parquet(
        df_x.groupBy(F.col(value_col).alias("vx")).agg(
            F.count(F.lit(1)).cast("long").alias("cx")
        ),
        "qds_hl_hx_",
    )
    hy = spill_parquet(
        df_y.groupBy(F.col(value_col).alias("vy")).agg(
            F.count(F.lit(1)).cast("long").alias("cy")
        ),
        "qds_hl_hy_",
    )
    pairs = hx.crossJoin(F.broadcast(hy)).select(
        (F.col("vx") - F.col("vy")).alias("d"),
        (F.col("cx") * F.col("cy")).cast("long").alias("w"),
    )
    diffs = pairs.groupBy("d").agg(F.sum("w").cast("long").alias("w"))
    w_cum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = diffs.select(
        "d",
        F.sum(F.col("w").cast("decimal(38,0)")).over(w_cum).alias("cum"),
    )
    total = diffs.agg(
        F.sum(F.col("w").cast("decimal(38,0)")).alias("n_pairs")
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .where(
            # k = ceil(N/2) = (N+1) div 2, exact in decimal
            F.col("cum")
            >= F.expr("(n_pairs + CAST(1 AS DECIMAL(38,0))) div 2")
        )
        .agg(
            F.min("d").cast("long").alias("hl_shift"),
            F.min(F.col("n_pairs").cast("long")).alias("n_pairs"),
        )
    )
