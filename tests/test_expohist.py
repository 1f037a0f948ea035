"""Exponential-histogram sliding-window sums (sketches/expohist.py).

Closed form == per-bit DGIM cascade for every (ts, vals) stream, and
the Datar et al. relative-error bound holds for every window — the
same two-sided contract test_properties.py pins for DGIM counts.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from q_digest_spark.sketches.expohist import EHSum


def _random_stream(rng, n, vmax):
    ts = np.sort(rng.integers(0, 10_000, size=n).astype(np.int64))
    vals = rng.integers(1, vmax + 1, size=n).astype(np.int64)
    return ts, vals


@given(
    n=st.integers(1, 60),
    vmax=st.integers(1, 9),
    r=st.integers(2, 4),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_closed_form_matches_per_bit_cascade(n, vmax, r, seed):
    rng = np.random.default_rng(seed)
    ts, vals = _random_stream(rng, n, vmax)
    closed = EHSum.from_sorted_values(ts, vals, r=r)
    oracle = EHSum(r=r)
    for t, v in zip(ts, vals):
        oracle.insert_value(int(t), int(v))
    assert closed.ts == oracle.ts
    assert closed.size == oracle.size


@given(
    n=st.integers(1, 200),
    vmax=st.integers(1, 50),
    r=st.integers(2, 4),
    seed=st.integers(0, 2**32 - 1),
    wfrac=st.integers(1, 100),
)
@settings(max_examples=150, deadline=None)
def test_window_sum_bound(n, vmax, r, seed, wfrac):
    rng = np.random.default_rng(seed)
    ts, vals = _random_stream(rng, n, vmax)
    sk = EHSum.from_sorted_values(ts, vals, r=r)
    t_now = int(ts[-1])
    span = max(1, t_now - int(ts[0]))
    window = max(1, span * wfrac // 100)
    exact = int(vals[ts > t_now - window].sum())
    est = sk.estimate(t_now, window)
    # window always contains the newest element -> exact >= 1
    assert exact >= 1
    # canonical-state bound (max error ratio at oldest-bucket size 2);
    # see sketches/expohist.py — reduces to the 50% DGIM bound at r=2
    assert r * abs(est - exact) <= exact


def test_full_window_is_exact_total():
    ts = np.array([1, 2, 3, 10, 11], dtype=np.int64)
    vals = np.array([5, 1, 7, 2, 4], dtype=np.int64)
    sk = EHSum.from_sorted_values(ts, vals)
    # a window covering the whole stream: every bucket except the
    # oldest is counted fully; the halved oldest keeps the estimate
    # within the bound of the grand total
    exact = int(vals.sum())
    est = sk.estimate(10**6, 10**7)
    assert 2 * abs(est - exact) <= exact


def test_unit_values_reduce_to_dgim():
    from q_digest_spark.sketches.dgim import DGIM

    ts = np.sort(np.random.default_rng(7).integers(0, 1000, 80)).astype(np.int64)
    eh = EHSum.from_sorted_values(ts, np.ones_like(ts))
    dg = DGIM.from_sorted_ts(ts)
    assert eh.ts == dg.ts and eh.size == dg.size


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        EHSum.from_sorted_values([3, 1], [1, 1])
    with pytest.raises(ValueError):
        EHSum.from_sorted_values([1, 2], [1, 0])
    assert EHSum.from_sorted_values([], []).n_buckets() == 0


def test_operator_spark(spark):
    """eh_window_sums on a planted fixture: exact sums verified by
    hand, bound flag true per key."""
    import datetime

    from pyspark.sql import functions as F

    from q_digest_spark.operators.windowsum import eh_window_sums

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for day, v in [(0, 10), (1, 20), (5, 30), (6, 40), (7, 50)]:
        rows.append(("a", base + datetime.timedelta(days=day), float(v)))
    rows.append(("b", base, 7.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = eh_window_sums(
        df, "k", "ts", F.col("value").cast("long"),
        window_us=3 * 86400 * 10**6,
    ).collect()
    got = {r["k"]: (r["exact_sum_in_window"], r["within_bound"]) for r in out}
    # key a, t_now = day 7: window (day4, day7] -> 30+40+50
    assert got["a"] == (120, True)
    # key b: single row, window contains it
    assert got["b"] == (7, True)
