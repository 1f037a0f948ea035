"""Scalable heavy-hitter (top-k) detection: Count-Min + distributed
candidate generation.

The reference has no frequency sketch (its only query is quantile/rank,
serial-implementation/src/qcore.c:341-388); Count-Min heavy hitters are
a north_rule addition ("heavy-hitter-domain queries").

Exact top-k via groupBy().count().orderBy() shuffles one row per
DISTINCT key — at 10^12 web pages that is billions of (domain, count)
rows through one sort. The sketch path shuffles almost nothing:

1. one mapInPandas pass builds, per input partition, BOTH a Count-Min
   partial AND that partition's local top-m candidate keys
   (pandas value_counts — vectorized);
2. candidates are unioned + deduped (tiny: n_partitions * m keys);
3. the merged CMS scores every candidate; global top-k by estimate.

Correctness contract — this is a HEAVY-HITTER operator, not an exact
top-k: a key appears in the candidate set iff it is a local top-m key
in >= 1 partition. A key whose count in its largest partition exceeds
that partition's m-th largest count is guaranteed in (true for any key
with a partition share above ~rows_per_partition/(m+1), pigeonhole);
keys in a NEAR-UNIFORM tail (no count separation, e.g. 1500 keys with
counts 80-99 split 32 ways) have no such guarantee and the returned
tail of the top-k can differ from the exact one. When the distinct-key
count itself is small, set candidates_per_partition >= n_distinct and
the candidate set is exhaustive regardless of partitioning. Verified
against the exact group-by oracle in tests/test_heavy_hitters.py on
the Zipf-skewed domains fixture (multi-partition), and exhaustively
(m >= n_distinct) in the driver query.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .quantiles import HashedCMS, hashed_cms_from_bytes

_PARTIAL_SCHEMA = "kind string, key long, cnt long, sketch binary"


def cms_topk(
    df: DataFrame,
    col,
    k: int = 10,
    candidates_per_partition: int = 64,
    depth: int = 5,
    width: int = 16384,
    fanout: int = 32,
) -> DataFrame:
    """Top-k keys of ``col`` by Count-Min estimated frequency.

    Returns a DataFrame (key_hash long, est_cnt long) ordered by
    est_cnt desc — key_hash is xxhash64(col), join back to a
    dimension/sample to recover readable keys. One full-data pass;
    shuffle volume is O(n_partitions * (candidates + sketch bytes)).
    """
    m = max(candidates_per_partition, 4 * k)
    sdf = df.select(F.xxhash64(col if not isinstance(col, str) else F.col(col)).alias("h"))

    def build(batches: Iterable[pd.DataFrame]):
        sk = HashedCMS(depth, width)
        counts: pd.Series | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].dropna()
            sk.update_batch(h.to_numpy(dtype=np.int64))
            vc = h.value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
        if counts is None:
            return
        top = counts.nlargest(m)
        yield pd.DataFrame(
            {
                "kind": ["cand"] * len(top) + ["cms"],
                "key": np.concatenate([top.index.to_numpy(dtype=np.int64), [0]]),
                "cnt": np.concatenate([top.to_numpy(dtype=np.int64), [0]]),
                "sketch": [None] * len(top) + [sk.to_bytes()],
            }
        )

    partials = sdf.mapInPandas(build, _PARTIAL_SCHEMA)
    partials.persist()
    try:
        cand = (
            partials.where(F.col("kind") == "cand")
            .groupBy("key")
            .agg(F.sum("cnt").alias("lb"))
            .orderBy(F.desc("lb"), F.asc("key"))  # deterministic cut
            .limit(max(4 * k, m))
            .toPandas()
        )
        sk_rows = partials.where(F.col("kind") == "cms").select("sketch").collect()
    finally:
        partials.unpersist()
    merged: HashedCMS | None = None
    for r in sk_rows:
        cur = hashed_cms_from_bytes(bytes(r["sketch"]))
        merged = cur if merged is None else merged.merge(cur)
    if merged is None or not len(cand):
        spark = df.sparkSession
        return spark.createDataFrame([], "key_hash long, est_cnt long")
    ests = merged.sketch.estimate_hashes(
        cand["key"].to_numpy(dtype=np.int64).view(np.uint64)
    )
    out = pd.DataFrame({"key_hash": cand["key"], "est_cnt": ests.astype(np.int64)})
    out = out.sort_values(
        ["est_cnt", "key_hash"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    return df.sparkSession.createDataFrame(out.astype({"key_hash": "int64", "est_cnt": "int64"}))


def cms_topk_with_keys(
    df: DataFrame, col, k: int = 10, **kwargs
) -> DataFrame:
    """cms_topk joined back to the (distinct) key values — convenience
    for columns whose distinct set is broadcast-able (e.g. domains).
    The join is broadcast on the tiny top-k side."""
    top = cms_topk(df, col, k=k, **kwargs)
    c = F.col(col) if isinstance(col, str) else col
    keys = df.select(c.alias("key"), F.xxhash64(c).alias("key_hash")).distinct()
    return (
        keys.join(F.broadcast(top), "key_hash")
        .select("key", "est_cnt")
        .orderBy(F.desc("est_cnt"), F.asc("key"))
    )


def guaranteed_heavy(df: DataFrame, col, k: int) -> DataFrame:
    """Keys whose EXACT count clears the Misra-Gries guarantee
    threshold count·(k+1) > n — i.e. exactly the keys an MG(k) summary
    is guaranteed to retain. Pigeonhole bounds the survivor set to at
    most k keys, so this is the scale-safe exact side of an MG
    verification: one (key) shuffle with map-side combine for the
    counts, the grand total broadcast back as a 1-row join, the
    threshold filter evaluated in the JVM — the ONLY rows that ever
    reach the driver are the <= k survivors. Never collect the full
    per-key histogram (a web-scale vocabulary is billions of rows).

    Returns (key, exact_count) with integer-exact threshold arithmetic
    (count·(k+1) > n), reproducible verbatim in any SQL engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    counts = df.select(c.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    total = counts.agg(F.sum("exact_count").alias("__n"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("exact_count") * (k + 1) > F.col("__n"))
        .select("key", "exact_count")
    )
