"""Funnel / retention analytics (operators/events.py): greedy-walk
semantics vs a local oracle, strict-timestamp edges, randomized
differential, and the dense zero-filled retention grid."""

import datetime as dt
import random

from pyspark.sql import functions as F

from q_digest_spark.operators.events import funnel_counts, retention_counts

T0 = dt.datetime(2024, 1, 1)


def _t(h):
    return T0 + dt.timedelta(hours=h)


def _local_funnel(rows, steps):
    """Greedy earliest-match walk per user, strict > between steps."""
    by_u = {}
    for u, t, s in rows:
        by_u.setdefault(u, []).append((t, s))
    reached = [0] * len(steps)
    for evs in by_u.values():
        evs.sort()
        d, last = 0, None
        for t, s in evs:
            if d < len(steps) and s == steps[d] and (last is None or t > last):
                d += 1
                last = t
        for i in range(d):
            reached[i] += 1
    return {i + 1: n for i, n in enumerate(reached)}


def test_funnel_ordered_and_strict_edges(spark):
    rows = [
        (1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "purchase"),
        (2, _t(3), "click"), (2, _t(4), "view"),     # out of order
        (3, _t(5), "view"), (3, _t(5), "click"),     # same-ts: strict
        (4, _t(6), "view"), (4, _t(7), "click"),
        (5, _t(8), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    ).repartition(4)
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 4, 2: 2, 3: 1}


def test_funnel_randomized_differential(spark):
    rng = random.Random(13)
    steps = ["a", "b", "c"]
    rows = [
        (
            rng.randrange(40),
            _t(rng.randrange(200)),
            rng.choice(steps + ["x"]),  # noise step filtered out
        )
        for _ in range(1500)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    ).repartition(8)
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
    }
    want = _local_funnel([r for r in rows if r[2] in steps], steps)
    assert got == want


def test_funnel_empty_and_cap(spark):
    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    got = funnel_counts(df, "user_id", "ts", "event_type", ["a", "b"]).collect()
    assert sorted((r["step_idx"], r["n_users"]) for r in got) == [(1, 0), (2, 0)]

    # cap: user completes only within the first 2 events
    rows = [(1, _t(0), "a"), (1, _t(1), "b"), (1, _t(2), "c")]
    df2 = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    capped = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(
            df2, "user_id", "ts", "event_type", ["a", "b", "c"], max_events=2
        ).collect()
    }
    assert capped == {1: 1, 2: 1, 3: 0}


def test_retention_dense_grid(spark):
    rows = [
        (1, _t(0)), (1, _t(24)), (1, _t(24 * 3)),   # d0, +1, +3
        (2, _t(24 * 2)), (2, _t(24 * 2 + 1)),       # d0 only (same day)
        (3, _t(0)), (3, _t(24 * 9)),                # +9 beyond window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["offset_days"]: r["n_retained"]
        for r in retention_counts(df, "user_id", "ts", 7).collect()
    }
    assert got == {0: 3, 1: 1, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_autocorr_integer_form_matches_numpy():
    """The integer-exact lag correlation (dev_t = n*c_t - S) equals the
    float textbook estimator to quantization precision, and the
    half-away-from-zero rounding matches DuckDB's toward-zero // on
    the magnitude."""
    import numpy as np

    rng = np.random.default_rng(23)
    cs = rng.integers(50, 400, 30).tolist()
    n, S = len(cs), sum(cs)
    dev = [n * c - S for c in cs]
    D = max(1, sum(d * d for d in dev))
    m = S / n
    fdev = np.array(cs, dtype=float) - m
    fD = float((fdev**2).sum())
    for k in range(1, 8):
        Nk = sum(dev[t] * dev[t + k] for t in range(n - k))
        mag = (2000 * abs(Nk) + D) // (2 * D)
        got = mag if Nk >= 0 else -mag
        want = float((fdev[:-k] * fdev[k:]).sum()) / fD
        assert abs(got / 1000 - want) <= 0.0011, (k, got, want)


def test_chisq_integer_form_matches_float_reference():
    """Per-cell half-up quantization of (n*O - R*C)^2/(n*R*C) sums to
    the float chi-squared within per-cell rounding slack, including
    zero cells (which must contribute their expected term)."""
    import random

    rng = random.Random(31)
    langs, sources = ["a", "b", "c"], ["x", "y", "z", "w"]
    cells = {
        (l, s): rng.randrange(0, 50)
        for l in langs
        for s in sources
        if not (l == "c" and s == "w")  # a structurally-zero cell
    }
    R = {l: sum(v for (a, _), v in cells.items() if a == l) for l in langs}
    C = {s: sum(v for (_, b), v in cells.items() if b == s) for s in sources}
    n = sum(cells.values())
    stat = 0
    fstat = 0.0
    for l in langs:
        for s in sources:
            o = cells.get((l, s), 0)
            d = n * o - R[l] * C[s]
            den = n * R[l] * C[s]
            stat += (2 * 1_000_000 * d * d + den) // (2 * den)
            e = R[l] * C[s] / n
            fstat += (o - e) ** 2 / e
    assert abs(stat / 1e6 - fstat) <= len(langs) * len(sources) * 1e-6 + 1e-9


def test_funnel_attribution_window(spark):
    import datetime as dt

    from q_digest_spark.operators.events import funnel_counts

    def T(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    rows = [
        # user 1 converts fully within 10-minute gaps
        (1, T(0), "view"), (1, T(5), "click"), (1, T(12), "purchase"),
        # user 2: click comes 2 hours after the view -> blocked at 1h
        (2, T(0), "view"), (2, T(120), "click"), (2, T(125), "purchase"),
        # user 3: click in window, purchase out of window
        (3, T(0), "view"), (3, T(30), "click"), (3, T(300), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["view", "click", "purchase"]

    def counts(gap):
        return {
            r["step_idx"]: r["n_users"]
            for r in funnel_counts(df, "user_id", "ts", "event_type",
                                   steps, max_gap_seconds=gap).collect()
        }

    assert counts(3600) == {1: 3, 2: 2, 3: 1}
    # no window: everyone converts
    unwindowed = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert unwindowed == {1: 3, 2: 3, 3: 3}
    # boundary: exactly the gap is INSIDE the window (<=)
    assert counts(30 * 60)[2] == 2


def test_interval_concurrency_matches_bruteforce(spark):
    """Distributed sweep-line per-day max == brute-force evaluation of
    the step function at every boundary point (closed intervals)."""
    import numpy as np

    from q_digest_spark.operators.events import interval_concurrency_by_day

    DAY = 86400000000
    rng = np.random.default_rng(7)
    ivals = []
    for day in range(3):
        starts = rng.integers(0, DAY - 1000, 40) + day * DAY
        lens = rng.integers(0, DAY // 4, 40)
        for s, L in zip(starts, lens):
            ivals.append((int(s), int(min(s + L, (day + 1) * DAY - 1))))
    df = spark.createDataFrame(ivals, "s long, e long").repartition(5)
    got = {
        r["day_num"]: r["max_concurrent"]
        for r in interval_concurrency_by_day(df, "s", "e", partitions=8).collect()
    }

    pts = sorted({s for s, _ in ivals} | {e + 1 for _, e in ivals})
    want: dict[int, int] = {}
    for t in pts:
        active = sum(1 for s, e in ivals if s <= t <= e)
        d = t // DAY
        want[d] = max(want.get(d, 0), active)
    assert got == want


def test_interval_concurrency_overlap_shapes(spark):
    from q_digest_spark.operators.events import interval_concurrency_by_day

    # nested, chained, and disjoint intervals in one day
    rows = [(10, 100), (20, 50), (30, 40), (100, 200), (300, 400)]
    df = spark.createDataFrame(rows, "s long, e long")
    out = interval_concurrency_by_day(df, "s", "e").collect()
    assert len(out) == 1
    # at t in [30,40]: three nested active; boundary t=100: [10,100] and
    # [100,200] both active (closed) -> max is 3
    assert out[0]["max_concurrent"] == 3


def test_funnel_conversion_latencies_greedy_semantics(spark):
    """Latency = final-step match minus the FIRST step-1 anchor (the
    greedy walk never re-anchors), only for fully-converted users."""
    from datetime import datetime

    from q_digest_spark.operators.events import funnel_conversion_latencies

    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 converts: anchor view@1 (not the later view@3), purchase@9
        (1, T(1), "view"), (1, T(3), "view"), (1, T(5), "click"),
        (1, T(9), "purchase"),
        # u2 stalls at click
        (2, T(1), "view"), (2, T(2), "click"),
        # u3: purchase BEFORE click does not count; converts via later one
        (3, T(1), "view"), (3, T(2), "purchase"), (3, T(4), "click"),
        (3, T(6), "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, t timestamp, s string")
    got = {
        r["u"]: r["latency_us"]
        for r in funnel_conversion_latencies(
            df, "u", "t", "s", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 8_000_000, 3: 5_000_000}


def test_cumulative_hazard_hand_computed(spark):
    from datetime import datetime

    from q_digest_spark.operators.events import cumulative_hazard

    D = lambda d, h=0: datetime(2024, 1, d, h)
    # u1: lifetime 0 (one event, day 1)         -> death at 0
    # u2: days 1-2, lifetime 1                  -> death at 1
    # u3: days 1-3, lifetime 2                  -> death at 2
    # u4: days 2-10 (corpus max), lifetime 8    -> CENSORED (margin 1)
    rows = [
        (1, D(1)),
        (2, D(1)), (2, D(2)),
        (3, D(1)), (3, D(3)),
        (4, D(2)), (4, D(10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["lifetime"]: (r["n_at_risk"], r["d_events"], r["cum_hazard_ppm"])
        for r in cumulative_hazard(df, "user_id", "ts").collect()
    }
    # at-risk: t=0 all 4; t=1 three; t=2 two; t=8 one (censored)
    h0 = 1_000_000 // 4          # 250000
    h1 = h0 + 1_000_000 // 3     # 583333
    h2 = h1 + 1_000_000 // 2     # 1083333
    assert got == {
        0: (4, 1, h0),
        1: (3, 1, h1),
        2: (2, 1, h2),
        8: (1, 0, h2),           # censored day adds zero hazard
    }


def test_cusum_telescoped_equals_recurrence(spark):
    from datetime import datetime, timedelta

    from q_digest_spark.operators.events import cusum_daily_counts

    # 20 quiet days (~100 events) then a planted step to ~200
    counts = [100, 98, 103, 101, 99, 102, 100, 97, 104, 100,
              101, 99, 100, 102, 98, 100, 103, 99, 101, 100,
              205, 198, 210, 202, 207]
    rows = []
    eid = 0
    base = datetime(2024, 3, 1)
    for day, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, base + timedelta(days=day, seconds=eid % 80000)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["day_index"]: (r["n_events"], r["cusum"], r["alarm"])
        for r in cusum_daily_counts(df, "ts").collect()
    }
    # python recurrence oracle
    srt = sorted(counts)
    med = srt[(len(counts) + 1) // 2 - 1]
    slack = (100_000 * med) // 1_000_000
    s = 0
    for day, n in enumerate(counts):
        s = max(0, s + (n - med - slack))
        alarm = s * 1_000_000 > 500_000 * med
        assert got[day] == (n, s, alarm), (day, got[day], (n, s, alarm))
    # the step change must actually fire
    assert got[len(counts) - 1][2] is True
    assert got[10][2] is False


def test_ewma_daily_alarms_hand_case(spark):
    """x = [100, 100, 200]: day1 ewma_prev = 100 (no alarm at 5%...
    wait x1=100 == level), day2 ewma_prev = (100+100)/2 = 100, x=200
    deviates 100% -> alarm. Exact dyadic arithmetic."""
    import datetime

    from pyspark.sql import functions as F

    from q_digest_spark.operators.events import ewma_daily_alarms

    rows = []
    for day, n in [(1, 100), (2, 100), (3, 200)]:
        for j in range(n):
            rows.append((datetime.datetime(2024, 1, day, 12, 0, j % 60),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = ewma_daily_alarms(df, "ts", rel_num=1, rel_den=20).collect()
    assert len(out) == 2
    d1, d2 = out
    assert d1["x"] == 100 and d1["ewma_prev_milli"] == 100000
    assert not d1["alarm"]
    # ewma after day2 = (100 + 100)/2 = 100
    assert d2["x"] == 200 and d2["ewma_prev_milli"] == 100000
    assert d2["alarm"]


def test_ewma_domain_guard(spark):
    import datetime

    import pytest

    from q_digest_spark.operators.events import ewma_daily_alarms

    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),)
        for i in range(45)
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    with pytest.raises(ValueError):
        ewma_daily_alarms(df, "ts")
