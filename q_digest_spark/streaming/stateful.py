"""Custom stateful streaming operator: per-key running sketches via
``applyInPandasWithState``.

Where ``sketch_stream.StreamingSketch`` folds a single global sketch
on the driver (foreachBatch), this operator keeps one sketch PER KEY
as Spark-managed state on the executors — the
``applyInPandasWithState`` pattern the reference architecture maps to
for keyed streams (e.g. per-language text-length quantiles over a
live crawl). State is the sketch's own binary serialization, so a
checkpoint/restore round-trips through exactly the same bytes the
batch pipeline shuffles.

Emits one row per updated key per micro-batch:
(key, n, p50, p95, p99) — estimates from the running sketch.

API-version note (probed r02): Spark 4's state-v2 API
(``transformWithStateInPandas`` / ``StatefulProcessor``) exists in
this PySpark build but its streaming Python driver worker crashes in
this container — it requires a functional ``google.protobuf``
(``ImportError: cannot import name 'descriptor'``), which is not
installed and cannot be added here. ``applyInPandasWithState``
covers the same per-key value-state contract and is the supported
path; migrating to a ``StatefulProcessor`` (getValueState with the
same ``STATE_SCHEMA``) is mechanical when the dependency exists.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n long, p50 double, p95 double, p99 double"
STATE_SCHEMA = "sketch binary, n long"


def make_stateful_quantiles(factory: Callable[[], object], deserialize):
    """Returns the (key, pdf_iter, state) -> pdf_iter function for
    df.groupBy(key).applyInPandasWithState(...)."""

    def update(
        key: Tuple[str], batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            buf, n = state.get
            sk = deserialize(bytes(buf))
        else:
            sk, n = factory(), 0
        for pdf in batches:
            vals = pdf["v"].dropna()
            if len(vals):
                sk.update_batch(vals.to_numpy())
                n += len(vals)
        state.update((sk.to_bytes(), n))
        est = sk.quantiles([0.5, 0.95, 0.99])
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "p50": [float(est[0])],
                "p95": [float(est[1])],
                "p99": [float(est[2])],
            }
        )

    return update


def make_stateful_quantiles_ttl(factory, deserialize, ttl_ms: int):
    """TTL variant: idle keys are EVICTED — on processing-time timeout
    the key's final estimates are emitted (final=true) and its state
    removed. Without eviction an unbounded key space (urls!) grows
    state forever; with it, state size is bounded by (arrival rate x
    ttl). A key seen again after eviction restarts from an empty
    sketch."""

    def update(
        key: Tuple[str], batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        def row(sk, n, final):
            est = sk.quantiles([0.5, 0.95, 0.99])
            return pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "p50": [float(est[0])],
                    "p95": [float(est[1])],
                    "p99": [float(est[2])],
                    "final": [final],
                }
            )

        if state.hasTimedOut:
            buf, n = state.get
            sk = deserialize(bytes(buf))
            state.remove()
            yield row(sk, n, True)
            return
        if state.exists:
            buf, n = state.get
            sk = deserialize(bytes(buf))
        else:
            sk, n = factory(), 0
        for pdf in batches:
            vals = pdf["v"].dropna()
            if len(vals):
                sk.update_batch(vals.to_numpy())
                n += len(vals)
        state.update((sk.to_bytes(), n))
        state.setTimeoutDuration(ttl_ms)
        yield row(sk, n, False)

    return update


def grouped_streaming_quantiles_ttl(
    stream_df, key_col: str, value_col: str, factory, deserialize,
    ttl_ms: int = 3_600_000, output_mode: str = "update",
):
    """Per-key running quantiles with state TTL (processing-time
    timeout eviction). Output adds a `final` flag: true on the
    eviction row. See make_stateful_quantiles_ttl for semantics.

    CAVEAT (observed in this Spark build): do NOT drive a query that
    uses ProcessingTimeTimeout with ``processAllAvailable()`` — the
    engine keeps scheduling timeout work and the call never returns.
    Poll the sink for expected rows instead (the pattern in
    tests/test_stateful_streaming.py)."""
    from pyspark.sql import functions as F

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias("v"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_stateful_quantiles_ttl(factory, deserialize, ttl_ms),
        outputStructType=OUTPUT_SCHEMA + ", final boolean",
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def grouped_streaming_quantiles(
    stream_df, key_col: str, value_col: str, factory, deserialize,
    output_mode: str = "update",
):
    """stream_df -> streaming DataFrame of per-key running quantiles.

    Usage::

        out = grouped_streaming_quantiles(stream, "lang",
                                          "text_len", factory, deser)
        q = out.writeStream.format("memory").queryName("t") \
               .outputMode("update").start()
    """
    from pyspark.sql import functions as F

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias("v"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_stateful_quantiles(factory, deserialize),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUTPUT_SCHEMA = "key string, item string, est long, n long"
MG_STATE_SCHEMA = "sketch binary, n long"


def make_stateful_heavy(k: int):
    """(key, pdf_iter, state) -> pdf_iter for per-key streaming
    Misra-Gries heavy hitters: state is the MG summary's own bytes,
    each micro-batch emits the key's CURRENT candidate set tagged
    with the running n (the final batch's rows — max n per key — are
    the drained summary). MG's deterministic guarantee survives
    arbitrary batching: stored count <= true count <= stored +
    n/(k+1), so every item with true count > n/(k+1) is in the final
    candidate set regardless of how the stream was chopped."""
    from ..sketches.misragries import MisraGries

    def update(
        key: Tuple[str], batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            buf, n = state.get
            sk = MisraGries.from_bytes(bytes(buf))
        else:
            sk, n = MisraGries(k), 0
        for pdf in batches:
            vals = pdf["v"].dropna()
            if len(vals):
                sk.update_batch(vals.to_numpy())
                n += len(vals)
        state.update((sk.to_bytes(), n))
        items = sk.items()
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(items),
                "item": list(items.keys()),
                "est": [int(v) for v in items.values()],
                "n": [n] * len(items),
            }
        )

    return update


def grouped_streaming_heavy(
    stream_df, key_col: str, value_col: str, k: int = 256,
    output_mode: str = "update",
):
    """stream_df -> streaming DataFrame of per-key Misra-Gries
    candidate sets (key, item, est, n). State size is O(k) per key,
    sharded across executors by the stream's groupBy."""
    from pyspark.sql import functions as F

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("v"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_stateful_heavy(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
