"""Streaming deduplication for a live crawl.

A crawl stream re-fetches urls (retries, mirrors, sitemap loops); the
batch engine dedups with exact_dedup / MinHash (operators/dedup.py),
and this module is the streaming counterpart:

- `dedup_stream_by_key`: Spark's `dropDuplicatesWithinWatermark` —
  state holds one entry per key seen within the watermark horizon, so
  state size is bounded by (arrival rate x watermark), not stream
  length. The right tool when re-fetches cluster in time (retries).

- `bloom_dedup_stream_partitioned`: the SCALE path — a salted bank
  of per-key-range Bloom filters held as Spark-managed state
  (`applyInPandasWithState`), one filter per bank on the executors.
  No driver bottleneck, state is checkpointed by the engine (a
  restart resumes with the filters intact), and capacity scales
  horizontally: n_banks * m_bits_per_bank bits across the cluster.

- `BloomStreamDedup`: the single-filter foreachBatch variant (one
  global filter folded on the driver). A url is emitted at most once
  per driver lifetime; a small false-positive rate (sized by
  m_bits/k) drops some first occurrences — the standard trade for
  crawl frontiers at 10^12 urls where exact keyed state cannot fit.
  Replay semantics WITHIN one driver process: a COMMITTED batch
  replayed emits nothing (batch-id idempotence); a batch whose sink
  call FAILED is retried with its keys still absent from the filter,
  so they are re-emitted — at-least-once delivery, never loss.
  Across restarts the filter only survives when `state_path` is set
  (the filter + last batch id are persisted after every committed
  batch and loaded on construction); without it, use the partitioned
  variant for restart-safe forever-dedup.
"""

from __future__ import annotations

import os
import struct
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, functions as F


def dedup_stream_by_key(
    stream_df: DataFrame, key_col: str, ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """First occurrence per key within the watermark horizon; state
    for a key is dropped once the watermark passes its event time."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def bloom_dedup_stream_partitioned(
    stream_df: DataFrame,
    key_col: str,
    n_banks: int = 64,
    m_bits_per_bank: int = 1 << 22,
    k: int = 7,
) -> DataFrame:
    """Restart-safe, executor-distributed forever-dedup: keys are
    salted into `n_banks` ranges (pmod of the 64-bit key hash) and
    each bank keeps its own Bloom filter in the streaming state store
    — the frontier lives on the executors, sharded and checkpointed
    by the engine, so it scales past one machine and survives query
    restarts (unlike a driver-held filter). Emits first-seen rows
    with the input schema. Capacity = n_banks * m_bits_per_bank bits
    total (defaults: 64 * 512 KiB = 32 MiB of state); size banks so
    kn/m per bank keeps the false-positive rate acceptable — false
    positives DROP first occurrences, never duplicate."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..sketches import Bloom, bloom_from_bytes

    cols = list(stream_df.columns)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in stream_df.schema.fields
    )
    hashed = stream_df.withColumn("__h", F.xxhash64(key_col)).withColumn(
        "__bank", F.pmod(F.col("__h"), F.lit(n_banks))
    )

    def update(key, batches, state: "GroupState"):
        import numpy as np

        if state.exists:
            (buf,) = state.get
            bl = bloom_from_bytes(bytes(buf))
        else:
            bl = Bloom(m_bits_per_bank, k)
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.drop_duplicates("__h")
            h = pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
            seen = bl.contains_hashes(h)
            fresh = pdf.loc[~seen]
            if len(fresh):
                # fold before the next chunk so intra-batch repeats
                # across Arrow chunks are suppressed too
                bl.add_hashes(fresh["__h"].to_numpy(dtype=np.int64).view(np.uint64))
                yield fresh[cols]
        state.update((bl.to_bytes(),))

    return hashed.groupBy("__bank").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="filter binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class BloomStreamDedup:
    """foreachBatch-driven forever-dedup with O(m_bits) state on the
    driver. See the module docstring for replay/restart semantics;
    set `state_path` to persist the filter across restarts, or use
    bloom_dedup_stream_partitioned for executor-sharded state.

    Usage::

        dd = BloomStreamDedup(m_bits=1 << 24, k=7,
                              on_batch=lambda df, bid: df.write...)
        q = dd.attach(stream_df, "url")
    """

    def __init__(
        self,
        m_bits: int = 1 << 24,
        k: int = 7,
        on_batch: Callable[[DataFrame, int], None] | None = None,
        state_path: str | None = None,
    ):
        from ..sketches import Bloom, bloom_from_bytes

        self.bloom = Bloom(m_bits, k)
        self.on_batch = on_batch
        self.emitted = 0
        self._last_batch = -1
        self.state_path = state_path
        if state_path and os.path.exists(state_path):
            try:
                with open(state_path, "rb") as f:
                    raw = f.read()
                (self._last_batch,) = struct.unpack("<q", raw[:8])
                loaded = bloom_from_bytes(raw[8:])
            except Exception as e:
                raise ValueError(
                    f"corrupt BloomStreamDedup state file {state_path!r}: {e}"
                ) from e
            if loaded.m_bits != m_bits or loaded.k != k:
                raise ValueError(
                    f"BloomStreamDedup state at {state_path!r} was built with "
                    f"m_bits={loaded.m_bits}, k={loaded.k} but the constructor "
                    f"asked for m_bits={m_bits}, k={k} — resizing a running "
                    "filter is not possible; delete the state file to start a "
                    "fresh frontier (re-emitting everything) or keep the old "
                    "parameters"
                )
            self.bloom = loaded

    def _save_state(self) -> None:
        """Atomic (tmp + rename) persist of filter + last batch id,
        called only after the sink committed — a crash between commit
        and save replays the batch, which the at-least-once contract
        already allows."""
        if not self.state_path:
            return
        d = os.path.dirname(os.path.abspath(self.state_path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".bloomstate_")
        with os.fdopen(fd, "wb") as f:
            f.write(struct.pack("<q", self._last_batch))
            f.write(self.bloom.to_bytes())
        os.replace(tmp, self.state_path)

    def _process(self, batch_df: DataFrame, batch_id: int, key_col: str) -> None:
        import numpy as np

        if batch_id <= self._last_batch:
            return  # replayed micro-batch (idempotence)
        pdf = (
            batch_df.select(F.xxhash64(key_col).alias("h"))
            .toPandas()
            .drop_duplicates("h")
        )
        hashes = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        seen = self.bloom.contains_hashes(hashes)
        fresh = pdf.loc[~seen]
        if len(fresh):
            # emit FIRST, fold into the filter only after the sink
            # succeeded: if on_batch throws, the retry still sees these
            # keys as unseen and re-emits them (at-least-once, no loss);
            # folding before emitting would suppress them forever
            if self.on_batch is not None:
                keys = batch_df.sparkSession.createDataFrame(
                    fresh.rename(columns={"h": "key_hash"}), "key_hash long"
                )
                out = batch_df.join(
                    F.broadcast(keys),
                    F.xxhash64(key_col) == F.col("key_hash"),
                ).drop("key_hash").dropDuplicates([key_col])
                self.on_batch(out, batch_id)
            self.bloom.add_hashes(fresh["h"].to_numpy(dtype=np.int64).view(np.uint64))
            self.emitted += len(fresh)
        self._last_batch = batch_id
        self._save_state()

    def attach(self, stream_df: DataFrame, key_col: str):
        return (
            stream_df.writeStream.foreachBatch(
                lambda bdf, bid: self._process(bdf, bid, key_col)
            )
            .outputMode("update")
            .start()
        )
