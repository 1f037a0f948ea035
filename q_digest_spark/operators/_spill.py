"""Eager parquet spill for mid-pipeline materialization.

Why not persist()/localCheckpoint(): a lazily-returned plan can never
unpersist its cache (the unpersist would run before the caller's
action), and localCheckpoint itself registers a persisted RDD — both
leak session-lifetime executor storage. A parquet spill materializes
the rows durably with ZERO entries in the persisted-RDD map, survives
executor loss without recomputing upstream, and is what a 100 TB
pipeline does anyway (write the small intermediate, read it back).

Temp directories are removed at interpreter exit (atexit) when the
caller did not supply a directory; callers that pass ``spill_dir``
own the lifecycle.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


def spill_parquet(df: DataFrame, prefix: str, spill_dir: str | None = None) -> DataFrame:
    """Write ``df`` to parquet NOW and return a fresh reader over it.
    Eager: the upstream job runs at call time."""
    if spill_dir is None:
        d = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, d, True)
    else:
        d = spill_dir
    path = f"{d}/data.parquet"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
