"""Idempotent exactly-once parquet sink for ``foreachBatch``.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery:
if the process dies after the sink write but before the streaming
checkpoint records the batch as committed, the restarted query
REPLAYS the same micro-batch with the same ``batch_id``. Exactly-once
therefore needs an idempotent writer. This sink implements the
standard two-phase layout:

- batch data goes to ``<table>/data/batch=<id>/`` with
  ``mode("overwrite")`` — a half-written directory from a crashed
  attempt is erased by the retry, never double-counted;
- a commit marker ``<table>/_commits/<id>.json`` (rows + wall time +
  timestamp — the per-batch lineage record) is written to a temp name
  and ``os.replace``d into place, so a marker either exists completely
  or not at all;
- a replayed ``batch_id`` whose marker already exists is SKIPPED —
  the sink write itself is the idempotence point, no dedup pass
  downstream;
- the read side lists markers and reads ONLY committed batch
  directories, so an orphaned data dir from a crash that never
  committed is invisible to consumers.

At 100 TB the same layout works unchanged on an object store: the
marker directory is tiny (one object per micro-batch), the atomic
rename becomes the store's atomic PUT, and readers never list the
data tree — they list ``_commits`` and construct exact paths.

Reference scope: the C engine is batch-only (SURVEY.md §2.3);
exactly-once resumability is the streaming face of the north_rule's
"resumable from checkpoint with per-partition lineage + metrics".
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class IdempotentParquetSink:
    """Exactly-once parquet table writer for ``foreachBatch``.

    ``metrics`` after a run: ``written`` (fresh batches committed),
    ``skipped`` (replayed batches whose marker already existed),
    ``recovered`` (written batches whose data dir pre-existed from a
    crashed attempt — the overwrite-then-commit path).
    """

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.commits_dir = os.path.join(table_dir, "_commits")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commits_dir, exist_ok=True)
        self.metrics = {"written": 0, "skipped": 0, "recovered": 0}
        # test hook: raise after the data write but before the commit
        # marker of this batch id — simulates a crash in the window
        # where at-least-once delivery duplicates work
        self.fail_before_commit_of: int | None = None

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{int(batch_id)}.json")

    def _batch_path(self, batch_id: int) -> str:
        return os.path.join(self.data_dir, f"batch={int(batch_id)}")

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = self._marker(batch_id)
        if os.path.exists(marker):
            # replayed micro-batch, already committed: exactly-once
            self.metrics["skipped"] += 1
            return
        path = self._batch_path(batch_id)
        if os.path.exists(path):
            # data from a crashed attempt — overwrite erases it
            self.metrics["recovered"] += 1
        t0 = time.time()
        batch_df.write.mode("overwrite").parquet(path)
        if self.fail_before_commit_of == int(batch_id):
            self.fail_before_commit_of = None
            raise RuntimeError(
                f"injected crash after data write of batch {batch_id}"
            )
        n = batch_df.sparkSession.read.parquet(path).count()
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "batch_id": int(batch_id),
                    "rows": int(n),
                    "write_sec": round(time.time() - t0, 3),
                    "ts": time.time(),
                },
                f,
            )
        os.replace(tmp, marker)  # atomic commit
        self.metrics["written"] += 1

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return lambda bdf, bid: self.write_batch(bdf, bid)

    def committed_ids(self) -> list[int]:
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.commits_dir)
            if f.endswith(".json")
        )

    def committed(self, spark: SparkSession) -> DataFrame:
        """Read exactly the committed batches (orphans invisible)."""
        paths = [self._batch_path(b) for b in self.committed_ids()]
        if not paths:
            raise ValueError("no committed batches")
        return spark.read.parquet(*paths)

    def lineage(self) -> list[dict]:
        out = []
        for b in self.committed_ids():
            with open(self._marker(b)) as f:
                out.append(json.load(f))
        return out


def run_stream_to_sink(
    stream_df: DataFrame,
    sink: IdempotentParquetSink,
    checkpoint_dir: str,
    transform=None,
):
    """Run ``stream_df`` to completion (availableNow) through the
    idempotent sink; ``transform(batch_df)`` runs inside each batch
    (per-batch partial aggregation happens here, so the streaming
    side itself is stateless). Returns the StreamingQuery after it
    terminated; raises if the query failed."""

    def fold(bdf: DataFrame, bid: int) -> None:
        sink.write_batch(transform(bdf) if transform is not None else bdf, bid)

    q = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
