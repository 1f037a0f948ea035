"""Trailing-window SUM per key through the exponential-histogram
sketch (sketches/expohist.py, Datar et al. 2002 §5) — the sum twin of
operators/decay.dgim_window_counts.

Shape: EH state is order-dependent, so each key is one sorted pass
(parallelism across keys — the applyInPandasWithState streaming
shape). The canonical state is a closed form of the total (see
sketches/expohist.py), so per-key work is the numpy sort plus
O(log m) bucket bookkeeping, never a per-bit Python loop. In a true
streaming deployment the O(r log m) buckets ARE the memory footprint;
this batch operator builds the same state to verify the estimate
against ground truth.

At 100 TB: one shuffle on the key column; per-key memory is the
key's rows once (same bound as any per-key-sequential operator here —
keys are event types / languages, i.e. low cardinality with large
groups, and the fold touches only two narrow columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def eh_window_sums(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col,
    window_us: int,
    r: int = 2,
) -> DataFrame:
    """Per-key trailing-window sum: for each key, the EXACT sum of
    ``value_col`` over rows with ``ts in (max_ts_key - window,
    max_ts_key]`` plus a flag asserting the EH estimate honors its
    deterministic relative-error bound (``r * |est - exact| <=
    exact``, the canonical-state bound derived in sketches/expohist.py
    from Datar et al. 2002 — the familiar 50% DGIM guarantee at the
    default r = 2).

    ``value_col`` may be a Column expression; it must evaluate to a
    POSITIVE integer (rows with non-positive values are dropped — they
    carry no bits, matching the sums-of-positive-ints model).
    """
    import numpy as np
    import pandas as pd

    from ..sketches.expohist import EHSum

    w_us = int(window_us)
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    schema = f"{key_col} string, exact_sum_in_window long, within_bound boolean"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["__us"].to_numpy(np.int64)
        v = pdf["__v"].to_numpy(np.int64)
        order = np.argsort(ts, kind="stable")
        ts, v = ts[order], v[order]
        sk = EHSum.from_sorted_values(ts, v, r=r)
        t_now = int(ts[-1])
        in_win = ts > t_now - w_us
        exact = int(v[in_win].sum())
        est = sk.estimate(t_now, w_us)
        ok = r * abs(est - exact) <= exact
        return pd.DataFrame(
            {
                key_col: [pdf["__k"].iloc[0]],
                "exact_sum_in_window": [exact],
                "within_bound": [bool(ok)],
            }
        )

    return (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("__k"),
            # parquet timestamps may be NTZ; unix_micros wants TIMESTAMP.
            # Only within-key DIFFERENCES matter, so the constant
            # session-tz offset cancels (same pattern as decay.py).
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
            val.cast("long").alias("__v"),
        )
        .where(F.col("__v") > 0)
        .groupBy("__k")
        .applyInPandas(fold, schema)
    )
