"""Streaming deduplication for a live crawl.

A crawl stream re-fetches urls (retries, mirrors, sitemap loops); the
batch engine dedups with exact_dedup / MinHash (operators/dedup.py),
and this module is the streaming counterpart:

- `dedup_stream_by_key`: Spark's `dropDuplicatesWithinWatermark` —
  state holds one entry per key seen within the watermark horizon, so
  state size is bounded by (arrival rate x watermark), not stream
  length. The right tool when re-fetches cluster in time (retries).

- `bloom_dedup_stream`: probabilistic FOREVER-dedup with bounded
  state: a Bloom filter folded across micro-batches in foreachBatch.
  A url is emitted at most once ever; a small false-positive rate
  (sized by m_bits/k) drops some first occurrences — the standard
  trade for crawl frontiers at 10^12 urls where exact keyed state
  cannot fit. Replay semantics: a COMMITTED batch replayed after a
  restart emits nothing (batch-id idempotence); a batch whose sink
  call FAILED is retried with its keys still absent from the filter,
  so they are re-emitted — at-least-once delivery, never loss.
"""

from __future__ import annotations

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


class BloomStreamDedup:
    """foreachBatch-driven forever-dedup with O(m_bits) state.

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
    ):
        from ..sketches import Bloom

        self.bloom = Bloom(m_bits, k)
        self.on_batch = on_batch
        self.emitted = 0
        self._last_batch = -1

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

    def attach(self, stream_df: DataFrame, key_col: str):
        return (
            stream_df.writeStream.foreachBatch(
                lambda bdf, bid: self._process(bdf, bid, key_col)
            )
            .outputMode("update")
            .start()
        )
