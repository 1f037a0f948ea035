"""Neyman-optimal stratified sample allocation (Neyman 1934; survey
sampling at corpus scale): given strata (language, source, ...) and a
target metric, split a fixed sampling budget across strata
proportional to N_h * sigma_h — the allocation that minimizes the
variance of the stratified mean estimator for a fixed total n.

Integer-exact pipeline:

    var_num_h = N_h * sum(x^2) - sum(x)^2        (= N_h^2 * sigma_h^2)
    weight_h  = floor(sqrt(var_num_h) + 0.5)     (= N_h * sigma_h, half-up)
    seats_h   = Hamilton(budget, weight_h)       (operators/allocation.py)

``sqrt(var_num)`` is the ONLY non-integer step: int64 -> double
conversion (round-to-nearest, identical in every IEEE engine) followed
by a correctly-rounded sqrt, so the quantized weight is
bit-reproducible in any ANSI SQL engine. var_num fits int64 while
``N_h * sum(x^2) < 2^63`` — at true trillion-row scale route the two
products through DECIMAL(38,0) exactly like the Hamilton numerator.

Zero-variance strata (constant metric, or N_h = 1) have sigma_h = 0
and receive 0 seats — the textbook Neyman behavior (a deterministic
stratum needs no sample); they are still reported with weight 0
dropped by the Hamilton stage, mirroring its weight > 0 contract.

100-TB shape: ONE groupBy(stratum) with map-side partial sums is the
only row-scaled work; the sqrt + apportionment run on the O(#strata)
aggregate. Public methodology; no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import spill_parquet
from .allocation import hamilton_apportionment


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
) -> DataFrame:
    """One row per stratum with positive variance weight:
    ``(key, n_rows, weight, base_seats, extra, seats_alloc)`` —
    ``weight`` the half-up-rounded N_h * sigma_h, seats by the
    largest-remainder method, ``sum(seats_alloc) == budget`` exactly
    (unless every stratum is zero-variance)."""
    stats = (
        df.where(F.col(stratum_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(F.col(stratum_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value_col).cast("long")).alias("__s1"),
            F.sum(
                (F.col(value_col).cast("long") * F.col(value_col).cast("long"))
            ).alias("__s2"),
        )
        .select(
            "key",
            "n_rows",
            F.floor(
                F.sqrt(
                    (
                        F.col("n_rows") * F.col("__s2")
                        - F.col("__s1") * F.col("__s1")
                    ).cast("double")
                )
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nsigma"),
        )
    )
    # stats feeds TWO plan arms (the Hamilton stage and the n_rows
    # join) — spill so the input scan runs once and the tiny
    # per-stratum table re-reads with real size stats (multi-arm
    # invariant, CLAUDE.md)
    stats = spill_parquet(stats, "qds_neyman_")
    alloc = hamilton_apportionment(stats, "key", "nsigma", budget)
    return (
        stats.select("key", "n_rows")
        .join(alloc, "key")
        .select(
            "key", "n_rows", "weight", "base_seats", "extra", "seats_alloc"
        )
    )
