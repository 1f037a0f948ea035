"""Distributed membership probing: filter a huge table against a
Bloom filter (url blocklists, seen-before dedup, join pre-filtering).

The filter is built once (bloom_of — one pass over the small side),
then shipped to executors inside the UDF closure (a few MB; broadcast
semantics) and probed vectorized per Arrow batch. At 10^12 rows this
replaces a shuffle join against the blocklist with a map-side filter:
zero false negatives means nothing is wrongly dropped when
``keep_members=False`` (blocklist mode); false positives (rate
(1-e^(-kn/m))^k, sized by the caller) cause only over-dropping,
the safe direction for a blocklist.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches import Bloom, bloom_from_bytes


def bloom_probe_column(df: DataFrame, col, bloom: Bloom, flag_name: str = "is_member") -> DataFrame:
    """Adds a boolean column: does `col` (hashed JVM-side with
    xxhash64, matching bloom_of) hit the filter?"""
    buf = bloom.to_bytes()
    c = F.col(col) if isinstance(col, str) else col
    hdf = df.withColumn("__h", F.xxhash64(c))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{flag_name}` boolean"

    def probe(batches: Iterable[pd.DataFrame]):
        bl = bloom_from_bytes(buf)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["__h"].to_numpy().astype(np.int64).view(np.uint64)
            res = pdf.drop(columns=["__h"])
            res[flag_name] = bl.contains_hashes(h)
            yield res

    return hdf.mapInPandas(probe, out_schema)


def bloom_filter_rows(
    df: DataFrame, col, bloom: Bloom, keep_members: bool = False
) -> DataFrame:
    """Blocklist filter: keep rows whose key is NOT in the filter
    (default), or only member rows (keep_members=True, a lossy
    semi-join prefilter — follow with an exact join when false
    positives matter)."""
    flagged = bloom_probe_column(df, col, bloom, "__member")
    cond = F.col("__member") if keep_members else ~F.col("__member")
    return flagged.where(cond).drop("__member")


def counting_bloom_probe_column(
    df: DataFrame, col, cbf, flag_name: str = "is_member"
) -> DataFrame:
    """Counting-Bloom variant of bloom_probe_column: the filter being
    probed supports deletion, so 'is_member' reflects the NET insert
    minus delete state (zero false negatives for keys still present
    under multiset discipline). Same shipping model: serialized
    filter in the closure, JVM xxhash64 prehash, vectorized probe per
    Arrow batch."""
    from ..sketches import counting_bloom_from_bytes

    buf = cbf.to_bytes()
    c = F.col(col) if isinstance(col, str) else col
    hdf = df.withColumn("__h", F.xxhash64(c))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{flag_name}` boolean"

    def probe(batches: Iterable[pd.DataFrame]):
        bl = counting_bloom_from_bytes(buf)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["__h"].to_numpy().astype(np.int64).view(np.uint64)
            res = pdf.drop(columns=["__h"])
            res[flag_name] = bl.contains_hashes(h)
            yield res

    return hdf.mapInPandas(probe, out_schema)
