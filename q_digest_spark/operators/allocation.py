"""Largest-remainder (Hamilton) apportionment of an integer budget
across keys — the crawl-scheduling primitive that turns "fetch 10M
pages/day" into an exact per-host quota proportional to a measured
weight (bytes seen, page count, change rate).

Proportional allocation with floats drifts: rounding per-host rates
never sums back to the budget, and a 1-ulp difference flips a host's
quota between engines. Hamilton's method is integer-exact end to end:

    base_k  = (seats * w_k) div W          (floor quota)
    rem_k   = (seats * w_k) mod W
    R       = seats - sum(base_k)          (0 <= R < #keys)
    extra_k = 1 for the R largest rem_k    (ties: key ascending)

``sum(seats_k) == seats`` exactly, every seat count is ``base`` or
``base + 1`` (quota-rule compliant), and every step is non-negative
integer arithmetic (``div``/``%`` agree across Python, Spark, and any
ANSI engine on non-negative operands — see CLAUDE.md). The
``seats * w_k`` numerator runs in DECIMAL(38,0) (like the ppm shares
elsewhere in this repo), so the only domain bound is the one ANSI
mode already enforces at the scan: ``W = sum(weight) < 2^63``. No
silent wraparound, no deep-in-the-plan ANSI throw from the product.

100-TB shape: the row-scaled work is ONE groupBy(key) with map-side
combine; everything after runs on the O(#keys) aggregate (totals via
two broadcast 1-row cross joins, the extra-seat rank via one window
over the reduced key table — millions of hosts, not trillions of
pages). Known monotonicity caveats of Hamilton's method (Alabama
paradox) are inherent to the method, not this implementation.

Public methodology (Hamilton 1792, apportionment literature); no
reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hamilton_apportionment(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    seats: int,
) -> DataFrame:
    """Apportion ``seats`` across ``key_col`` groups proportional to
    ``sum(weight_col)`` by the largest-remainder method.

    Returns one row per key with non-null positive total weight:
    ``(key, weight, base_seats, extra, seats_alloc)`` — all BIGINT,
    ``sum(seats_alloc) == seats`` exactly.
    """
    if seats < 0:
        raise ValueError(f"seats must be >= 0, got {seats}")
    w = (
        df.where(F.col(weight_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.sum(weight_col).cast("long").alias("weight"))
        .where(F.col("weight") > 0)
    )
    tot = w.agg(F.sum("weight").alias("__tot"))
    t = w.crossJoin(F.broadcast(tot))
    t = t.select(
        "key",
        "weight",
        F.expr(
            f"CAST((CAST({seats} AS DECIMAL(38,0)) * weight) div __tot"
            " AS BIGINT)"
        ).alias("base_seats"),
        F.expr(
            f"CAST((CAST({seats} AS DECIMAL(38,0)) * weight) % __tot"
            " AS BIGINT)"
        ).alias("__rem"),
    )
    used = t.agg(F.sum("base_seats").alias("__used"))
    t = t.crossJoin(F.broadcast(used))
    # the rank runs over the O(#keys) aggregate, never the input rows
    rk = F.row_number().over(
        Window.orderBy(F.col("__rem").desc(), F.col("key").asc())
    )
    return (
        t.withColumn("__rk", rk)
        .select(
            "key",
            "weight",
            "base_seats",
            F.when(F.col("__rk") <= F.lit(seats) - F.col("__used"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
        )
        .withColumn(
            "seats_alloc", (F.col("base_seats") + F.col("extra")).cast("long")
        )
    )
