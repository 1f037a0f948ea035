"""Type-2 slowly-changing-dimension (SCD2) history compaction — the
warehouse-standard way to keep full attribute history: one row per
(key, attribute-state run) with a [valid_from, valid_to) interval
(Kimball & Ross, "The Data Warehouse Toolkit" — public methodology).

Input is a change log (key, ts, attrs...); output collapses
consecutive equal states per key (a re-assertion of the same value is
not a new version) and assigns each surviving version an interval
closed by the next version's start. The open (current) version gets a
far-future sentinel end instead of NULL, per the engine-portable
NULL-free contract.

Scale shape: ONE key-partitioned window does everything — lag() for
run-length compaction, lead() on the survivors for interval closing;
both are codegen'd window functions over each key's slice, and output
rows = number of genuine state changes, typically a tiny fraction of
the change log. No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

OPEN_END = "9999-12-31 00:00:00"


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    open_end: str = OPEN_END,
) -> DataFrame:
    """(key, attrs..., valid_from, valid_to): compacted SCD2 history.
    ``changes`` must have at most one row per (key, ts) — dedupe the
    raw feed to a per-timestamp final state first (the caller knows
    its tie rule). Intervals are half-open: valid_to equals the next
    version's valid_from, with ``open_end`` closing the current row.
    """
    if not attr_cols:
        raise ValueError("scd2_history needs at least one attribute")
    k = F.col(key_col)
    t = F.col(ts_col)
    base = changes.where(k.isNotNull() & t.isNotNull())
    w = Window.partitionBy(k).orderBy(t.asc())
    state = F.struct(*[F.col(c) for c in attr_cols])
    # null-safe comparison so NULL attribute values compare as states,
    # and the first row per key (lag NULL) always survives
    changed = base.withColumn("__prev", F.lag(state).over(w)).where(
        ~F.col("__prev").eqNullSafe(state)
    )
    w2 = Window.partitionBy(k).orderBy(t.asc())
    return changed.select(
        key_col,
        *attr_cols,
        t.alias("valid_from"),
        F.coalesce(
            F.lead(t).over(w2), F.lit(open_end).cast("timestamp")
        ).alias("valid_to"),
    )


def merge_on_read(
    base: DataFrame,
    deletes: DataFrame,
    upserts: DataFrame,
    key: str,
) -> DataFrame:
    """Merge-on-read CDC resolution, the lakehouse read path (Iceberg
    v2 equality deletes / Delta CDF semantics): the resolved view is

        (base rows whose key is in neither deletes nor upserts)
        UNION ALL upserts

    — deletes drop base rows, upserts REPLACE base rows by key (an
    upsert whose key is absent from base is an insert; a key in both
    deletes and upserts resolves to the upsert, matching
    apply-changes-last ordering).

    Scale shape: two key-only anti-joins. The change sides of a CDC
    batch are orders of magnitude smaller than base, so both are
    broadcast-hinted — the resolved view costs ONE base scan with
    zero shuffles of base rows. ``deletes``/``upserts`` may be any
    size though: without the hint Spark falls back to a shuffled
    anti-join, still correct.
    """
    del_keys = F.broadcast(deletes.select(key).distinct())
    up_keys = F.broadcast(upserts.select(key).distinct())
    survivors = base.join(del_keys, key, "left_anti").join(
        up_keys, key, "left_anti"
    )
    return survivors.unionByName(upserts.select(*base.columns))
