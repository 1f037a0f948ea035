"""Two-level mergeable-sketch aggregation over Spark DataFrames.

This is the Spark-native replacement for the reference's MPI dataflow
(scatter -> per-rank build -> serialize -> pairwise merge -> tree
reduce; /root/reference/mpi-implementation/src/main.c:18-65 and
treeReduce.c:31-90, whose recursive-doubling phase was never finished).
Here the same contract is expressed as:

  stage 1 (map-side partial): ``mapInPandas`` builds one sketch per
      input partition — vectorized ``update_batch`` per Arrow batch,
      zero per-row Python. Output: tiny rows ``(part_id, sketch
      binary, rows)``. At 100 TB this is the only full-data pass; its
      output is O(#partitions * sketch_size) bytes.

  stage 2 (intermediate tree level): partial rows are shuffled into
      ``fanout`` groups by ``part_id % fanout`` and merged with
      ``applyInPandas`` — the power-of-two orphan-folding tree of the
      reference generalized to any partition count. With 10^6 input
      partitions and fanout=64 the driver never sees more than 64 rows.

  stage 3 (final): the <=fanout intermediate sketches are collected
      and merged on the driver (equivalently: root of the tree).

Associativity/commutativity of ``merge`` is what makes the tree order
irrelevant (up to compression order — asserted within eps in tests).

Grouped aggregation (``grouped_sketch_rows``) does hand-built map-side
partial aggregation: each Arrow batch groups locally in pandas and
emits one partial sketch row per key, so the shuffle carries
O(#batches * #keys) sketch rows instead of the raw data — this is the
skew story for Zipf-distributed keys (a hot key costs one row per
batch, not one row per input record).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

SketchFactory = Callable[[], object]

PARTIAL_SCHEMA = "part_id long, sketch binary, rows long"


def _values_of(series: pd.Series) -> np.ndarray:
    arr = series.to_numpy()
    if arr.dtype == object:
        return arr
    return arr


def partial_sketches(
    df: DataFrame,
    col,
    factory: SketchFactory,
    *,
    value_name: str = "v",
    weight_col=None,
) -> DataFrame:
    """Stage 1: one serialized sketch per input partition.

    ``col`` may be a Column expression — selecting it *first* lets
    Catalyst prune every other column out of the scan (ReadSchema shows
    only the needed field) and push any upstream filter down to parquet.

    ``weight_col``: optional count column — rows are (value, weight)
    histogram entries, fed to ``update_batch(values, weights)``. This
    is how the JVM-precounted path (Catalyst hash-aggregate with
    map-side combine does the heavy counting) hands Python a bounded
    histogram instead of the raw rows.
    """
    cols = [F.col(col).alias(value_name) if isinstance(col, str) else col.alias(value_name)]
    if weight_col is not None:
        cols.append(
            F.col(weight_col).alias("__w") if isinstance(weight_col, str) else weight_col.alias("__w")
        )
    sdf = df.select(*cols).withColumn("__pid", F.spark_partition_id())

    def build(batches: Iterable[pd.DataFrame]):
        sk = factory()
        rows = 0  # total (signed) weight — what merged `rows` reports
        seen = 0  # values actually fed — the emit condition (signed
        # weights can sum to 0 across a partition whose counters are
        # decidedly nonzero, e.g. counting-Bloom +1/-1 streams)
        pid = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            if weight_col is not None:
                # drop the PAIR when either side is null (same
                # discipline as grouped_sketch_rows below)
                ok = pdf[value_name].notna() & pdf["__w"].notna()
                vals = pdf[value_name][ok]
            else:
                vals = pdf[value_name].dropna()
            if len(vals):
                if weight_col is not None:
                    w = pdf["__w"][ok].to_numpy()
                    sk.update_batch(_values_of(vals), w)
                    rows += int(w.sum())
                else:
                    sk.update_batch(_values_of(vals))
                    rows += len(vals)
                seen += len(vals)
        if seen == 0:
            return
        yield pd.DataFrame({"part_id": [pid], "sketch": [sk.to_bytes()], "rows": [rows]})

    return sdf.mapInPandas(build, PARTIAL_SCHEMA)


def _merge_partials_fn(deserialize):
    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = None
        rows = 0
        for buf, r in zip(pdf["sketch"], pdf["rows"]):
            cur = deserialize(bytes(buf))
            sk = cur if sk is None else sk.merge(cur)
            rows += int(r)
        return pd.DataFrame(
            {"part_id": [int(pdf["part_id"].iloc[0]) if len(pdf) else 0],
             "sketch": [sk.to_bytes()],
             "rows": [rows]}
        )

    return merge_group


def tree_merge(partials: DataFrame, deserialize, fanout: int = 32) -> DataFrame:
    """Stage 2: shuffle partial rows into ``fanout`` buckets and merge
    each bucket in one task (applyInPandas). Output <= fanout rows."""
    bucketed = partials.withColumn("part_id", F.pmod(F.col("part_id"), F.lit(fanout)))
    return bucketed.groupBy("part_id").applyInPandas(
        _merge_partials_fn(deserialize), PARTIAL_SCHEMA
    )


def sketch_aggregate(
    df: DataFrame,
    col,
    factory: SketchFactory,
    deserialize,
    fanout: int = 32,
    weight_col=None,
):
    """Full pipeline; returns the final merged sketch object (driver-side).

    Returns None on empty input.
    """
    partials = partial_sketches(df, col, factory, weight_col=weight_col)
    merged = tree_merge(partials, deserialize, fanout=fanout)
    rows = merged.select("sketch").collect()
    sk = None
    for r in rows:
        cur = deserialize(bytes(r["sketch"]))
        sk = cur if sk is None else sk.merge(cur)
    return sk


def grouped_sketch_rows(
    df: DataFrame,
    keys: Sequence[str],
    col,
    factory: SketchFactory,
    deserialize,
    *,
    value_name: str = "v",
    weight_col=None,
) -> DataFrame:
    """Grouped aggregation with hand-built map-side partials.

    Stage 1 groups *inside each Arrow batch* (pandas groupby) and emits
    one partial sketch row per (key-tuple, batch); stage 2 shuffles
    only those tiny rows by key and merges. The raw data is never
    shuffled — the Zipf/skew-safe plan demanded by BASELINE.json
    ("explicit salting/repartitioning for domain skew": a hot key here
    contributes one partial row per batch regardless of its row count).

    ``weight_col``: optional weight expression — rows become
    (value, weight) pairs fed to ``update_batch(values, weights)``
    and ``rows`` counts total weight, the grouped form of the
    reference's insert-with-amount (qcore.c:224-252).

    Returns a DataFrame ``keys..., sketch binary, rows long``.
    """
    keys = list(keys)
    cols = [F.col(k) for k in keys] + [
        F.col(col).alias(value_name) if isinstance(col, str) else col.alias(value_name)
    ]
    if weight_col is not None:
        cols.append(
            F.col(weight_col).alias("__w")
            if isinstance(weight_col, str)
            else weight_col.alias("__w")
        )
    sdf = df.select(*cols)
    n_key_fields = len(keys)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields[:n_key_fields]
    )
    partial_schema = f"{key_fields}, sketch binary, rows long"

    def build(batches: Iterable[pd.DataFrame]):
        # accumulate one sketch per key across ALL batches of the
        # partition (partial agg), emit once at the end
        acc: dict[tuple, object] = {}
        nrows: dict[tuple, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for kt, g in pdf.groupby(keys, sort=False, dropna=False):
                kt = kt if isinstance(kt, tuple) else (kt,)
                if weight_col is not None:
                    # drop the PAIR when either side is null — a NaN
                    # weight would crash the int cast (QDigest) or
                    # silently poison centroid weights (t-digest)
                    ok = g[value_name].notna() & g["__w"].notna()
                    vals = g[value_name][ok]
                else:
                    vals = g[value_name].dropna()
                if not len(vals):
                    continue
                sk = acc.get(kt)
                if sk is None:
                    sk = acc[kt] = factory()
                    nrows[kt] = 0
                if weight_col is not None:
                    w = g["__w"][ok].to_numpy()
                    sk.update_batch(_values_of(vals), w)
                    nrows[kt] += int(w.sum())
                else:
                    sk.update_batch(_values_of(vals))
                    nrows[kt] += len(vals)
        if not acc:
            return
        recs = {k: [] for k in keys}
        recs["sketch"] = []
        recs["rows"] = []
        for kt, sk in acc.items():
            for kname, kval in zip(keys, kt):
                recs[kname].append(kval)
            recs["sketch"].append(sk.to_bytes())
            recs["rows"].append(nrows[kt])
        yield pd.DataFrame(recs)

    partials = sdf.mapInPandas(build, partial_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = None
        rows = 0
        for buf, r in zip(pdf["sketch"], pdf["rows"]):
            cur = deserialize(bytes(buf))
            sk = cur if sk is None else sk.merge(cur)
            rows += int(r)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["sketch"] = [sk.to_bytes()]
        out["rows"] = [rows]
        return pd.DataFrame(out)

    return partials.groupBy(*keys).applyInPandas(merge_group, partial_schema)


def grouped_estimates(
    rows_df: DataFrame,
    keys: Sequence[str],
    deserialize,
    estimator=None,
    *,
    out_name: str = "est",
    out_type: str = "double",
    keep_rows: bool = False,
) -> DataFrame:
    """Distributed per-group sketch decode: map each (keys..., sketch)
    row of ``grouped_sketch_rows`` output to (keys..., estimate)
    WITHOUT collecting the group table — the scale-safe shape for
    bound-flag queries (join this against the exact aggregate in Spark
    instead of zipping two driver dicts; the flag then costs one tiny
    keyed join however many groups exist).

    ``estimator`` maps a deserialized sketch to a scalar (default:
    ``.estimate()``). ``keep_rows`` passes the per-group ``rows``
    count through."""
    keys = list(keys)
    est = estimator if estimator is not None else (lambda sk: sk.estimate())
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in rows_df.schema.fields
        if f.name in keys
    )
    out_schema = f"{key_fields}, `{out_name}` {out_type}"
    if keep_rows:
        out_schema += ", `rows` long"

    def decode(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {k: pdf[k] for k in keys}
            cols[out_name] = [est(deserialize(bytes(b))) for b in pdf["sketch"]]
            if keep_rows:
                cols["rows"] = pdf["rows"]
            yield pd.DataFrame(cols)

    return rows_df.mapInPandas(decode, out_schema)


def grouped_items(
    rows_df: DataFrame,
    keys: Sequence[str],
    deserialize,
    items_fn,
    item_schema: str,
) -> DataFrame:
    """Distributed per-group sketch EXPLODE: map each (keys..., sketch)
    row of ``grouped_sketch_rows`` output to zero or more item rows —
    the shape a per-group frequent-items summary needs (each group's
    Misra-Gries/Space-Saving tracked set becomes (keys..., token, est,
    err) rows) without collecting any group table. ``items_fn`` maps a
    deserialized sketch to a pandas DataFrame matching ``item_schema``
    (column names and order); the group-key columns are replicated
    onto every emitted row. Output size is bounded by
    groups x summary-capacity, never by the data."""
    keys = list(keys)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in rows_df.schema.fields
        if f.name in keys
    )
    out_schema = f"{key_fields}, {item_schema}"

    def decode(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            for _, row in pdf.iterrows():  # <= one row per group/batch
                items = items_fn(deserialize(bytes(row["sketch"])))
                if items is None or not len(items):
                    continue
                for k in reversed(keys):
                    items.insert(0, k, row[k])
                yield items

    return rows_df.mapInPandas(decode, out_schema)


def grouped_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col,
    factory: SketchFactory,
    deserialize,
    ps: Sequence[float],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Grouped quantiles, fully distributed: grouped_sketch_rows then a
    per-row estimate pass. Output: keys..., one long column per p."""
    keys = list(keys)
    out_names = list(out_names) if out_names else [f"p{int(p * 100)}" for p in ps]
    rows_df = grouped_sketch_rows(df, keys, col, factory, deserialize)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in rows_df.schema.fields
        if f.name in keys
    )
    out_schema = key_fields + ", " + ", ".join(f"`{n}` long" for n in out_names)

    def estimate(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {k: pdf[k] for k in keys}
            ests = [deserialize(bytes(b)).quantiles(ps) for b in pdf["sketch"]]
            for j, name in enumerate(out_names):
                cols[name] = [e[j] for e in ests]
            yield pd.DataFrame(cols)

    return rows_df.mapInPandas(estimate, out_schema)


def _sketch_merge_group(level_keys: list, deserialize):
    """applyInPandas body shared by rollup/cube: merge one group's
    sketch rows into a single row (sketches are mergeable, so this is
    the whole re-aggregation)."""

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = None
        rows = 0
        for buf, r in zip(pdf["sketch"], pdf["rows"]):
            cur = deserialize(bytes(buf))
            sk = cur if sk is None else sk.merge(cur)
            rows += int(r)
        out = {k: [pdf[k].iloc[0]] for k in level_keys}
        out["sketch"] = [sk.to_bytes()]
        out["rows"] = [rows]
        return pd.DataFrame(out)

    return merge_group


def cube_sketch_rows(
    df: DataFrame,
    keys: Sequence[str],
    col,
    factory: SketchFactory,
    deserialize,
) -> DataFrame:
    """Sketch-native CUBE: one sketch row for EVERY subset of ``keys``
    (all 2^n grouping sets) from ONE scan over the data — the finest
    (all-keys) rows are built once and eagerly spilled to parquet
    (operators/_spill.py, atexit-cleaned) so the 2^n merge branches
    reuse the materialized rows instead of re-executing the base scan;
    every other grouping set is a tiny merge of those rows grouped on
    its key subset. SQL CUBE re-aggregates the base data once per
    grouping set; here the base data is read once, full stop.

    Rolled-up key columns are NULL (SQL CUBE convention); ``level`` =
    number of keys retained — same-size subsets are disambiguated by
    WHICH columns are NULL. Output: ``keys..., level int,
    sketch binary, rows long``."""
    from itertools import combinations

    keys = list(keys)
    from ._spill import spill_parquet

    finest = spill_parquet(
        grouped_sketch_rows(df, keys, col, factory, deserialize), "qds_cube_"
    )
    key_fields = {
        f.name: f.dataType.simpleString()
        for f in finest.schema.fields
        if f.name in keys
    }

    def _schema(level_keys: list[str]) -> str:
        fields = ", ".join(f"`{k}` {key_fields[k]}" for k in level_keys)
        return (fields + ", " if fields else "") + "sketch binary, rows long"

    outs = []
    for n in range(len(keys), -1, -1):
        for subset in map(list, combinations(keys, n)):
            if n == len(keys):
                merged = finest
            elif subset:
                merged = finest.groupBy(*subset).applyInPandas(
                    _sketch_merge_group(subset, deserialize), _schema(subset)
                )
            else:
                merged = finest.groupBy().applyInPandas(
                    _sketch_merge_group([], deserialize), _schema([])
                )
            padded = merged.withColumn("level", F.lit(len(subset)))
            for k in keys:
                if k not in subset:
                    padded = padded.withColumn(k, F.lit(None).cast(key_fields[k]))
            outs.append(padded.select(*keys, "level", "sketch", "rows"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def rollup_sketch_rows(
    df: DataFrame,
    keys: Sequence[str],
    col,
    factory: SketchFactory,
    deserialize,
) -> DataFrame:
    """Sketch-native ROLLUP: one sketch row for every prefix level of
    ``keys`` — (k1..kn), (k1..kn-1), ..., (k1), () — where the finest
    level comes from ONE pass over the data and every coarser level is
    produced by MERGING the next-finer level's sketch rows (sketches
    are mergeable, so the raw data is scanned exactly once; SQL ROLLUP
    re-aggregates the base rows per level). The finest rows (one tiny
    sketch row per group) are eagerly spilled to parquet so the union
    branches and coarser merges reuse the materialized rows instead of
    re-executing the base scan once per level (a lazy persist could
    never be unpersisted, and localCheckpoint registers a persisted
    RDD for the session).

    Rolled-up key columns are NULL, like SQL ROLLUP. Output:
    ``keys..., level int, sketch binary, rows long`` with level = the
    number of grouping keys retained.
    """
    keys = list(keys)
    from ._spill import spill_parquet

    finest = spill_parquet(
        grouped_sketch_rows(df, keys, col, factory, deserialize), "qds_rollup_"
    )
    key_fields = {
        f.name: f.dataType.simpleString()
        for f in finest.schema.fields
        if f.name in keys
    }

    def _schema(level_keys: list[str]) -> str:
        fields = ", ".join(f"`{k}` {key_fields[k]}" for k in level_keys)
        return (fields + ", " if fields else "") + "sketch binary, rows long"

    def _merge_level(level_keys: list[str]):
        return _sketch_merge_group(level_keys, deserialize)

    levels = [finest.withColumn("level", F.lit(len(keys)))]
    current = finest
    for n in range(len(keys) - 1, -1, -1):
        level_keys = keys[:n]
        if level_keys:
            coarser = current.groupBy(*level_keys).applyInPandas(
                _merge_level(level_keys), _schema(level_keys)
            )
        else:
            coarser = current.groupBy().applyInPandas(
                _merge_level([]), _schema([])
            )
        current = coarser
        padded = coarser.withColumn("level", F.lit(n))
        for k in keys[n:]:
            padded = padded.withColumn(k, F.lit(None).cast(key_fields[k]))
        levels.append(padded.select(*keys, "level", "sketch", "rows"))
    out = levels[0].select(*keys, "level", "sketch", "rows")
    for l in levels[1:]:
        out = out.unionByName(l)
    return out
