"""Distributed 2-D Pareto skyline — multi-objective record selection.

Training-data curation constantly trades objectives off (longest AND
most lexically diverse documents, highest quality AND lowest dup
score); the skyline (Börzsönyi, Kossmann & Stocker, ICDE 2001) is the
exact answer set: every record no other record dominates, where p
dominates q iff p >= q on BOTH metrics and > on at least one
(maximization semantics; negate a metric upstream to minimize).

Distribution uses the skyline's closure property: the global skyline
is contained in the union of per-partition skylines (a point nothing
dominates globally is undominated in its own partition), and
re-filtering that union yields EXACTLY the global skyline (any
globally dominated point is dominated by some maximal point, which
survives its partition). So:

  1. reduce to DISTINCT (m1, m2) pairs (one narrow shuffle — ties
     carry no information for dominance);
  2. per-partition numpy sweep: sort (m1 desc, m2 desc); only each
     m1-block's head can survive, and it survives iff its m2 exceeds
     the running max over strictly-greater m1 — O(k log k), no
     pairwise loop;
  3. one final sweep over the tiny union of local skylines
     (single partition by construction of its size: for 2-D data the
     local skylines are the staircase frontiers, orders of magnitude
     smaller than the input);
  4. semi-join the surviving (m1, m2) points back to the full table
     to emit every record sitting on the frontier.

100-TB shape: one distinct shuffle + one broadcast-able semi-join;
no stage ever materializes a pairwise comparison. Public methodology
(ICDE'01 skyline operator; divide-and-conquer variant); no reference
counterpart.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_PAIR_SCHEMA = "m1 long, m2 long"


def _sweep(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Indices of the maximization skyline of distinct (m1, m2) pairs."""
    order = np.lexsort((-m2, -m1))  # m1 desc, then m2 desc
    s1, s2 = m1[order], m2[order]
    # block heads: first occurrence of each m1 in the desc order
    head = np.ones(len(s1), dtype=bool)
    head[1:] = s1[1:] != s1[:-1]
    h_idx = np.flatnonzero(head)
    h_m2 = s2[h_idx]
    # running max of m2 over STRICTLY greater m1 = exclusive prefix max
    prev = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(h_m2)[:-1]))
    keep = h_m2 > prev
    return order[h_idx[keep]]


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    parts = [b for b in batches if len(b)]
    if not parts:
        return
    df = pd.concat(parts, ignore_index=True)
    m1 = df["m1"].to_numpy(np.int64)
    m2 = df["m2"].to_numpy(np.int64)
    yield df.iloc[_sweep(m1, m2)]


def skyline_2d(
    df: DataFrame,
    id_col: str,
    m1_col: str,
    m2_col: str,
) -> DataFrame:
    """All rows on the (max, max) Pareto frontier of two integer
    metrics. Returns ``(id, m1, m2)`` — every id whose metric pair is
    undominated (ties on the frontier all survive: equal points do
    not dominate each other)."""
    pts = df.select(
        F.col(id_col).alias("_sky_id"),
        F.col(m1_col).cast("long").alias("m1"),
        F.col(m2_col).cast("long").alias("m2"),
    ).where(F.col("m1").isNotNull() & F.col("m2").isNotNull())
    distinct = pts.select("m1", "m2").distinct()
    local = distinct.mapInPandas(_local_skyline, _PAIR_SCHEMA)
    final = local.repartition(1).mapInPandas(_local_skyline, _PAIR_SCHEMA)
    return pts.join(F.broadcast(final), ["m1", "m2"]).select(
        F.col("_sky_id").alias(id_col), "m1", "m2"
    )
