"""Rendezvous (highest-random-weight) hashing — consistent shard
routing as a pure column expression.

HRW (Thaler & Ravishankar, "Using Name-Based Mappings to Increase Hit
Rates", IEEE/ACM ToN 1998 — public literature) assigns a key to the
shard maximizing h(key, shard). Its consistency property is what a
100 TB pipeline wants from its routing layer: adding or removing one
shard moves ONLY the keys that map to that shard (expected 1/n of
traffic), with no ring state, no vnode table, nothing to store — the
assignment is a deterministic function of (key, shard set).

Engine-portable by construction: the weight is the md5 hex digest of
'key|shard' (fixed-width lowercase hex in Spark and every SQL engine,
so lexicographic max == numeric 128-bit max), and the argmax is
F.greatest over (hash, shard) structs — all codegen'd column algebra,
zero shuffles, zero Python. Shard count is bounded by expression
width (fine for the hundreds-of-shards regime HRW targets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def rendezvous_weight(key_col, shard: str) -> Column:
    """md5('key|shard') hex — the HRW weight, identical in any engine
    that renders integers and md5 the same way (all of them)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(
        F.concat(k.cast("string"), F.lit("|"), F.lit(shard)).cast("binary")
    )


def rendezvous_assign(
    df: DataFrame, key_col: str, shards: list[str], out_col: str = "shard"
) -> DataFrame:
    """Adds ``out_col``: the HRW-chosen shard for each row's key.
    Deterministic tie-break (impossible in practice at 128 bits) by
    shard name via the struct comparison."""
    if len(shards) < 1:
        raise ValueError("need at least one shard")
    if len(shards) == 1:
        return df.withColumn(out_col, F.lit(shards[0]))
    cands = [
        F.struct(
            rendezvous_weight(key_col, s).alias("h"), F.lit(s).alias("s")
        )
        for s in shards
    ]
    return df.withColumn(out_col, F.greatest(*cands)["s"])
