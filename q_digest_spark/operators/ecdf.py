"""Distributed ECDF comparison: the two-sample Kolmogorov–Smirnov
statistic, computed EXACTLY with no single-partition sort.

KS = max_x |F1(x) − F2(x)| over the union of observed values. The
float-free form max |cum1·n2 − cum2·n1| / (n1·n2) needs cumulative
counts in value order — a prefix scan. A naive
``Window.orderBy(value)`` with no partitionBy funnels everything
through ONE task (the exact scale-killer VERDICT r02 flagged in the
old trimmed-mean query). Instead this is the classic two-pass
distributed scan:

1. one shuffle groups rows by DISTINCT value with map-side combine
   (the scan input is bounded by value cardinality, not row count);
2. ``repartitionByRange`` + ``sortWithinPartitions`` orders the
   distinct values across P parallel partitions (range partitioner
   assigns ascending ranges to ascending partition ids);
3. per-partition totals (≤ P tiny rows) are collected, exclusive
   offsets are computed on the driver and shipped in the closure;
4. a mapInPandas pass adds local cumulative sums to the partition's
   offset — every partition scans independently.

All arithmetic is int64-exact (bound: n1·n2 < 2^63, i.e. ~3·10^9
rows per side; lift cum·n products to object/decimal beyond that).
No reference counterpart (qcore.c has no distribution tests); public
methodology: the standard DVR/ECDF KS construction.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def grouped_value_counts(
    df: DataFrame, group_col: str, value_col, g1, g2
) -> DataFrame:
    """(value, c1, c2): per-distinct-value counts for the two samples —
    the bounded scan input. One shuffle, map-side combine."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    g = F.col(group_col)
    return (
        df.where(g.isin([g1, g2]) & c.isNotNull())
        .select(g.alias("__g"), c.alias("v"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("__g") == g1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("__g") == g2, 1).otherwise(0)).alias("c2"),
        )
    )


def prefix_scan(
    counts: DataFrame, value_col: str, sum_cols: list[str], partitions: int = 32
) -> DataFrame:
    """Adds ``cum_<col>`` running totals in ``value_col`` order via the
    two-pass distributed scan described in the module docstring.

    Bucket boundaries are computed ONCE on the driver (approxQuantile
    over the bounded distinct-value table) and the bucket id is a pure
    function of the value — NOT ``spark_partition_id()``, which is
    unstable across the offsets job and the scan job (AQE may coalesce
    the upstream shuffle differently per job, silently re-shaping
    range partitions; caught by the sf0.1 replay). Boundary skew only
    affects balance, never correctness: a partition holding several
    buckets scans them as contiguous sorted runs with their own
    offsets."""
    cuts = counts.stat.approxQuantile(
        value_col, [i / partitions for i in range(1, partitions)], 0.001
    )
    cuts = sorted(set(cuts))
    if cuts:
        barr = F.array(*[F.lit(float(b)) for b in cuts])
        bucket = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc
            + (F.col(value_col).cast("double") >= b).cast("int"),
        )
    else:
        bucket = F.lit(0)
    d = counts.withColumn("__bkt", bucket)
    per_bkt = (
        d.groupBy("__bkt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )
    per_bkt.sort(key=lambda r: r["__bkt"])
    offsets: dict[int, tuple] = {}
    run = [0] * len(sum_cols)
    for r in per_bkt:
        offsets[int(r["__bkt"])] = tuple(run)
        for i, c in enumerate(sum_cols):
            run[i] += int(r[c] or 0)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in d.schema.fields
    ) + ", " + ", ".join(f"`cum_{c}` long" for c in sum_cols)

    def scan(batches: Iterable[pd.DataFrame]):
        carry: dict[int, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(
                ["__bkt", value_col], kind="mergesort"
            ).reset_index(drop=True)
            outs = {f"cum_{c}": np.empty(len(pdf), dtype=np.int64) for c in sum_cols}
            for bkt, g in pdf.groupby("__bkt", sort=True):
                b = int(bkt)
                st = carry.get(b)
                if st is None:
                    st = carry[b] = list(offsets.get(b, (0,) * len(sum_cols)))
                pos = pdf.index.get_indexer(g.index)
                for i, c in enumerate(sum_cols):
                    cs = g[c].to_numpy(dtype=np.int64).cumsum() + st[i]
                    outs[f"cum_{c}"][pos] = cs
                    st[i] = int(cs[-1])
            for name, arr in outs.items():
                pdf[name] = arr
            yield pdf

    return (
        d.repartition(partitions, "__bkt")
        .sortWithinPartitions("__bkt", value_col)
        .mapInPandas(scan, schema)
        .drop("__bkt")
    )


def ks_2sample(
    df: DataFrame, group_col: str, value_col, g1, g2, partitions: int = 32
) -> DataFrame:
    """One-row DataFrame (n1, n2, ks_num) with
    KS = ks_num / (n1·n2) exactly. All integers — any SQL engine
    reproduces the row verbatim."""
    counts = grouped_value_counts(df, group_col, value_col, g1, g2)
    # spill-free reuse: the scan re-reads `counts`; persist the tiny
    # distinct-value table so the two passes don't rescan raw data
    counts = counts.persist()
    try:
        tot = counts.agg(
            F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
        ).collect()[0]
        n1, n2 = int(tot["n1"] or 0), int(tot["n2"] or 0)
        scan = prefix_scan(counts, "v", ["c1", "c2"], partitions)
        ks = scan.agg(
            F.max(
                F.abs(
                    F.col("cum_c1") * F.lit(n2) - F.col("cum_c2") * F.lit(n1)
                )
            )
        ).collect()[0][0]
    finally:
        counts.unpersist()
    return df.sparkSession.createDataFrame(
        [(n1, n2, int(ks or 0))], "n1 long, n2 long, ks_num long"
    )


def mwu_2sample(
    df: DataFrame, group_col: str, value_col, g1, g2, partitions: int = 32
) -> DataFrame:
    """EXACT two-sample Mann–Whitney U statistic (tie-aware), fully
    distributed over the same prefix scan KS and W1 use. One-row
    DataFrame (n1, n2, u1_x2 decimal(38,0)) where

        U1 = u1_x2 / 2,   U1 = sum over pairs (x in g1, y in g2) of
                               [x > y] + 0.5 * [x == y].

    The pairwise definition collapses to a per-distinct-value local
    term: with c1/c2 the per-value counts and cum2 the inclusive
    running total of c2 in value order,

        2 * U1 = sum_v c1(v) * (2 * (cum2(v) - c2(v)) + c2(v))

    — (cum2 - c2) counts strictly-smaller g2 values, c2 the ties. No
    global-order window, no neighbor join; doubling keeps half-ranks
    in exact integers (decimal(38,0) so corpus-scale n1*n2 never
    wraps). Identity check: u1_x2 + u2_x2 = 2*n1*n2. Public
    methodology: Mann & Whitney 1947 with the standard midrank tie
    treatment; no reference counterpart (qcore.c has no distribution
    tests).
    """
    from decimal import Decimal

    counts = grouped_value_counts(df, group_col, value_col, g1, g2).persist()
    try:
        tot = counts.agg(
            F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
        ).collect()[0]
        n1, n2 = int(tot["n1"] or 0), int(tot["n2"] or 0)
        if n1 == 0 or n2 == 0:
            return df.sparkSession.createDataFrame(
                [(n1, n2, Decimal(0))], "n1 long, n2 long, u1_x2 decimal(38,0)"
            )
        scan = prefix_scan(counts, "v", ["c1", "c2"], partitions)
        dec = "decimal(38,0)"
        below2 = (F.col("cum_c2") - F.col("c2")).cast(dec)
        term = F.col("c1").cast(dec) * (
            F.lit(2).cast(dec) * below2 + F.col("c2").cast(dec)
        )
        num = scan.agg(F.sum(term).alias("num")).collect()[0]["num"]
    finally:
        counts.unpersist()
    return df.sparkSession.createDataFrame(
        [(n1, n2, Decimal(int(num)))], "n1 long, n2 long, u1_x2 decimal(38,0)"
    )


def psi_binned(
    df: DataFrame,
    group_col: str,
    value_col,
    g1,
    g2,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices of an integer
    column — the binned drift metric ML monitoring dashboards pair
    with KS:

        PSI = sum over buckets of (p1_i - p2_i) * ln(p1_i / p2_i)

    with add-one (Laplace) smoothing p_i = (c_i + 1) / (n + B) so
    empty buckets are defined. Engine-portable by construction:
    bucket edges are pure integer arithmetic (step = max // B + 1,
    bucket = v div step — no float boundary can disagree), bucket
    counts are exact, and the only float steps are IEEE division and
    ln on identical doubles; callers quantize the returned double
    (ppm) for cross-engine hashing.

    Two passes over the input (max for the edge, then ONE
    conditional-sum groupBy on the bucket id with map-side combine);
    the persisted B-row bucket table serves both the totals and the
    psi aggregate, so nothing re-scans the raw data afterwards.
    Nothing row-scaled leaves the executors. Returns one row:
    (n1, n2, psi double).
    """
    gc = F.col(group_col)
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    # non-negative integer domain (negative rows would land in no
    # bucket and silently vanish from n1/n2 — refuse them up front)
    ev = df.where(gc.isin([g1, g2]) & vc.isNotNull()).select(
        gc.alias("__g"), vc.cast("long").alias("__v")
    )
    ev = ev.where(F.col("__v") >= 0)
    hi = ev.agg(F.max("__v")).collect()[0][0]
    if hi is None:
        return df.sparkSession.createDataFrame(
            [(0, 0, 0.0)], "n1 long, n2 long, psi double"
        )
    step = int(hi) // n_buckets + 1
    counts = (
        # `div` = true integer division (double `/` loses exactness
        # past 2^53 on a generic integer column)
        ev.groupBy(F.expr(f"__v div {step}").alias("b"))
        .agg(
            F.sum(F.when(F.col("__g") == g1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("__g") == g2, 1).otherwise(0)).alias("c2"),
        )
    )
    spark = df.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("b"))
    # persist the B-row bucket table: the totals and psi aggregates
    # below must not re-scan the raw input (same discipline as
    # ks_2sample's counts persist)
    full = (
        buckets.join(counts, "b", "left")
        .select(
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        .persist()
    )
    try:
        tot = full.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2")).collect()[0]
        n1, n2 = int(tot["n1"]), int(tot["n2"])
        p1 = (F.col("c1") + F.lit(1)).cast("double") / F.lit(float(n1 + n_buckets))
        p2 = (F.col("c2") + F.lit(1)).cast("double") / F.lit(float(n2 + n_buckets))
        psi = full.agg(
            F.sum((p1 - p2) * F.log(p1 / p2)).alias("psi")
        ).collect()[0]["psi"]
    finally:
        full.unpersist()
    return spark.createDataFrame(
        [(n1, n2, float(psi))], "n1 long, n2 long, psi double"
    )


def w1_2sample(
    df: DataFrame, group_col: str, value_col, g1, g2, partitions: int = 32
) -> DataFrame:
    """EXACT 1-Wasserstein (earth mover's) distance between two
    integer-valued samples, fully distributed. One-row DataFrame
    (n1, n2, w1_num decimal(38,0)) with

        W1 = integral of |F1 - F2| = w1_num / (n1 * n2)   exactly.

    The textbook form sums |cumdiff_i| * (v_{i+1} - v_i) over distinct
    values — which needs every row's NEXT value, i.e. a global-order
    neighbor join. Telescoping removes it: with
    D_i = |cum1_i*n2 - cum2_i*n1| (and D_0 = 0, D_last = 0 since both
    CDFs end at 1),

        sum_i D_i * (v_{i+1} - v_i)  =  sum_j v_j * (D_{j-1} - D_j)

    and D_{j-1} is computable LOCALLY on row j (subtract the row's own
    counts from its running totals). So W1 reduces to a plain
    aggregate over the same distributed prefix scan KS uses — one
    extra shuffle-free pass, no window over a global sort, no neighbor
    access. Integer-exact throughout: terms are cast to decimal(38,0)
    before summation so corpus-scale n1*n2*v never wraps.
    """
    counts = grouped_value_counts(df, group_col, value_col, g1, g2).persist()
    try:
        tot = counts.agg(
            F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
        ).collect()[0]
        n1, n2 = int(tot["n1"] or 0), int(tot["n2"] or 0)
        if n1 == 0 or n2 == 0:
            from decimal import Decimal

            return df.sparkSession.createDataFrame(
                [(n1, n2, Decimal(0))], "n1 long, n2 long, w1_num decimal(38,0)"
            )
        scan = prefix_scan(counts, "v", ["c1", "c2"], partitions)
        dec = "decimal(38,0)"
        ln1, ln2 = F.lit(n1).cast(dec), F.lit(n2).cast(dec)
        cur = F.abs(
            F.col("cum_c1").cast(dec) * ln2 - F.col("cum_c2").cast(dec) * ln1
        )
        prev = F.abs(
            (F.col("cum_c1") - F.col("c1")).cast(dec) * ln2
            - (F.col("cum_c2") - F.col("c2")).cast(dec) * ln1
        )
        num = scan.agg(
            F.sum(F.col("v").cast(dec) * (prev - cur)).alias("num")
        ).collect()[0]["num"]
    finally:
        counts.unpersist()
    from decimal import Decimal

    return df.sparkSession.createDataFrame(
        [(n1, n2, Decimal(int(num)))], "n1 long, n2 long, w1_num decimal(38,0)"
    )
