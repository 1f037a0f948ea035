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
