"""k-anonymity risk profiling over quasi-identifier combinations —
the privacy-governance audit a web-corpus release needs before
publication (Sweeney 2002; Samarati 2001): how many records sit in
quasi-identifier equivalence classes smaller than k, i.e. could be
singled out by joining on the published attributes alone.

The profile buckets every QI group by its size into the standard
re-identification risk classes

    k = 1        unique           (directly re-identifiable)
    2 <= k < 5   small            (high linkage risk)
    5 <= k < 20  medium
    k >= 20      large            (conventional k>=20 safe harbor)

and reports, per class: the number of QI groups, the number of rows
they cover, and that row share in ppm. All classes are always
emitted (zero-filled via a literal class frame) so the output shape
is fixed and NULL-free regardless of the data.

Integer-exact end to end: group sizes and row counts are exact
longs; the ppm share uses the repo's half-up integer division on a
non-negative numerator (engine-safe, CLAUDE.md int-div note). The
numerator 2e6 * rows stays under 2^63 up to ~4.6e12 rows — the
10^12-document north-star scale — beyond which callers should lift
it to decimal(38,0) like the other ppm shares.

100-TB shape: ONE row-scaled groupBy on the QI tuple with map-side
combine (the shuffle carries one count per distinct QI combination),
then a four-row class aggregate; the class frame and the 1-row total
broadcast. No Python in the hot path, no collect of QI groups.

No reference counterpart (qcore.c has no relational layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PPM = 1_000_000

#: (class label, inclusive lower bound, inclusive upper bound) —
#: upper bound None = unbounded. Order defines the output ordering
#: contract shared with the DuckDB oracle.
RISK_CLASSES: tuple[tuple[str, int, int | None], ...] = (
    ("k_eq_1", 1, 1),
    ("k_2_4", 2, 4),
    ("k_5_19", 5, 19),
    ("k_ge_20", 20, None),
)


def _class_of(k: Column) -> Column:
    expr = F.lit(RISK_CLASSES[-1][0])
    for label, lo, hi in reversed(RISK_CLASSES[:-1]):
        expr = F.when(k <= F.lit(hi), F.lit(label)).otherwise(expr)
    return expr


def kanonymity_profile(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Risk-class profile of ``df`` under quasi-identifiers
    ``qi_cols`` -> (qi_class, n_groups, n_rows, rows_ppm), exactly
    ``len(RISK_CLASSES)`` rows, zero-filled, NULL-free.

    Rows with a NULL in any QI column are excluded from both the
    groups and the total (they form no joinable equivalence class);
    the oracle must apply the same filter.
    """
    cond = F.lit(True)
    for c in qi_cols:
        cond = cond & F.col(c).isNotNull()
    d = df.where(cond)

    groups = d.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    by_class = (
        groups.select(_class_of(F.col("k")).alias("qi_class"), "k")
        .groupBy("qi_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("g"),
            F.sum("k").cast("long").alias("r"),
        )
    )
    classes = df.sparkSession.createDataFrame(
        [(label,) for label, _, _ in RISK_CLASSES], "qi_class string"
    )
    total = d.agg(F.count(F.lit(1)).cast("long").alias("tot"))
    return (
        classes.join(by_class, "qi_class", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "qi_class",
            F.coalesce(F.col("g"), F.lit(0)).cast("long").alias("n_groups"),
            F.coalesce(F.col("r"), F.lit(0)).cast("long").alias("n_rows"),
            F.col("tot"),
        )
        # integer `div` (not float `/`): exact at any row count the
        # int64 numerator admits; numerator non-negative, so trunc
        # == floor == DuckDB `//`.
        .withColumn(
            "rows_ppm",
            F.expr(f"CAST(({2 * PPM} * n_rows + tot) DIV (2 * tot) AS LONG)"),
        )
        .drop("tot")
    )
