"""As-of join and binned range join (operators/joins.py): semantics
vs pandas merge_asof / brute-force oracles, plan shape (no
cartesian / nested-loop), tolerance and direction variants.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.joins import asof_join, range_join_binned


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.RandomState(5)
    n_t, n_q = 400, 300
    trades = pd.DataFrame(
        {
            "sym": rng.randint(0, 5, n_t),
            "t": rng.randint(0, 10_000, n_t).astype(np.int64),
            "trade_id": np.arange(n_t, dtype=np.int64),
        }
    ).drop_duplicates(["sym", "t"])
    quotes = pd.DataFrame(
        {
            "sym": rng.randint(0, 5, n_q),
            "t": rng.randint(0, 10_000, n_q).astype(np.int64),
            "px": rng.uniform(10, 20, n_q).round(4),
        }
    ).drop_duplicates(["sym", "t"])
    return (
        spark.createDataFrame(trades).repartition(8),
        spark.createDataFrame(quotes).repartition(8),
        trades,
        quotes,
    )


def _pandas_asof(trades, quotes, direction, tol=None):
    kw = {"tolerance": tol} if tol is not None else {}
    return (
        pd.merge_asof(
            trades.sort_values(["t", "trade_id"]),
            quotes.sort_values("t").rename(columns={"t": "t_q"}),
            left_on="t",
            right_on="t_q",
            by="sym",
            direction=direction,
            **kw,
        )
        .set_index("trade_id")
        .sort_index()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, trades_quotes, direction):
    sdf_t, sdf_q, trades, quotes = trades_quotes
    got = (
        asof_join(sdf_t, sdf_q, "sym", "t", "t", direction=direction)
        .toPandas()
        .set_index("trade_id")
        .sort_index()
    )
    exp = _pandas_asof(trades, quotes, direction)
    for tid in exp.index:
        e_px, g_px = exp.loc[tid, "px"], got.loc[tid, "px_r"]
        assert (pd.isna(e_px) and pd.isna(g_px)) or e_px == g_px, (
            tid, e_px, g_px,
        )


def test_asof_tolerance(spark, trades_quotes):
    sdf_t, sdf_q, trades, quotes = trades_quotes
    got = (
        asof_join(sdf_t, sdf_q, "sym", "t", "t", tolerance=F.lit(50))
        .toPandas()
        .set_index("trade_id")
        .sort_index()
    )
    exp = _pandas_asof(trades, quotes, "backward", tol=50)
    for tid in exp.index:
        e_px, g_px = exp.loc[tid, "px"], got.loc[tid, "px_r"]
        assert (pd.isna(e_px) and pd.isna(g_px)) or e_px == g_px, (
            tid, e_px, g_px,
        )


def test_asof_tie_on_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, lv string")
    right = spark.createDataFrame([(1, 100, "R")], "k long, t long, rv string")
    row = asof_join(left, right, "k", "t", "t").collect()[0]
    assert row["rv_r"] == "R"  # equal ts matches (<= semantics)
    fwd = asof_join(left, right, "k", "t", "t", direction="forward").collect()[0]
    assert fwd["rv_r"] == "R"


def test_asof_null_field_in_match_is_not_backfilled(spark):
    """Row-atomic carry: when the true as-of match has a NULL in a
    payload column, that NULL must survive — a per-column carry would
    back-fill it from an OLDER right row (the bug class DuckDB ASOF /
    pandas merge_asof semantics forbid)."""
    right = spark.createDataFrame(
        [(1, 1, 5.0, 100.0), (1, 2, None, 200.0)],
        "k long, t long, x double, y double",
    )
    left = spark.createDataFrame([(1, 3, "L")], "k long, t long, lv string")
    row = asof_join(left, right, "k", "t", "t").collect()[0]
    assert row["x_r"] is None and row["y_r"] == 200.0 and row["t_r"] == 2


def test_asof_no_match_keeps_left_row(spark):
    left = spark.createDataFrame([(1, 50, "L")], "k long, t long, lv string")
    right = spark.createDataFrame([(1, 100, "R")], "k long, t long, rv string")
    row = asof_join(left, right, "k", "t", "t").collect()[0]
    assert row["rv_r"] is None and row["lv"] == "L"


def test_asof_plan_single_key_shuffle_no_nested_loop(spark, trades_quotes):
    sdf_t, sdf_q, _, _ = trades_quotes
    plan = (
        asof_join(sdf_t, sdf_q, "sym", "t", "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the window sort is keyed (partitionBy sym), never a global sort:
    # every Sort in the plan must be non-global
    for line in plan.splitlines():
        if "Sort " in line and "global=true" in line:
            raise AssertionError(f"global sort in as-of plan: {line}")


def test_range_join_binned_vs_bruteforce(spark):
    rng = np.random.RandomState(9)
    pts = pd.DataFrame(
        {"pid": np.arange(500, dtype=np.int64), "v": rng.uniform(0, 100, 500).round(3)}
    )
    lo = rng.uniform(0, 95, 60).round(3)
    iv = pd.DataFrame(
        {
            "iid": np.arange(60, dtype=np.int64),
            "lo": lo,
            "hi": (lo + rng.uniform(0.5, 8, 60)).round(3),
        }
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(
            spark.createDataFrame(pts).repartition(4),
            spark.createDataFrame(iv).repartition(2),
            "v",
            "lo",
            "hi",
            bin_width=4.0,
        ).collect()
    }
    exp = {
        (int(p.pid), int(i.iid))
        for p in pts.itertuples()
        for i in iv.itertuples()
        if i.lo <= p.v <= i.hi
    }
    assert got == exp and len(exp) > 100


def test_range_join_plan_is_equi_join(spark):
    pts = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 0.7).alias("v"))
    iv = spark.createDataFrame([(0, 5.0, 25.0), (1, 30.0, 31.0)], "iid long, lo double, hi double")
    plan = (
        range_join_binned(pts, iv, "v", "lo", "hi", 5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_timestamp_tolerance_interval(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 23:00:00")],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "A")], "k long, ts string, v string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {
        str(r["ts"]): r["v_r"]
        for r in asof_join(
            left, right, "k", "ts", "ts", tolerance=F.expr("INTERVAL 1 HOUR")
        ).collect()
    }
    # 10:00 is 30min after the quote (within 1h); 23:00 is 13.5h after
    assert got["2024-01-01 10:00:00"] == "A"
    assert got["2024-01-01 23:00:00"] is None


def test_range_join_degenerate_interval_ignored(spark):
    pts = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    iv = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, 9.0, 2.0)], "iid long, lo double, hi double"
    )
    got = {(r["pid"], r["iid"]) for r in range_join_binned(pts, iv, "v", "lo", "hi", 3.0).collect()}
    assert got == {(1, 0)}  # the lo>hi interval matches nothing


def test_asof_randomized_differential_vs_duckdb(spark):
    """Seeded random tables, right side deduped per (key, ts):
    Spark asof_join must match DuckDB's native ASOF LEFT JOIN
    row-for-row — a third-engine differential beyond the pandas
    parity above."""
    import duckdb

    rng = np.random.RandomState(77)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 8, 600),
            "t": rng.randint(0, 5000, 600).astype(np.int64),
            "lid": np.arange(600, dtype=np.int64),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 8, 400),
                "t": rng.randint(0, 5000, 400).astype(np.int64),
                "rid": np.arange(400, dtype=np.int64),
            }
        )
        .sort_values("rid")
        .drop_duplicates(["k", "t"], keep="last")
    )
    got = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            spark.createDataFrame(left).repartition(8),
            spark.createDataFrame(right).repartition(4),
            "k",
            "t",
            "t",
            right_cols=["rid"],
        ).collect()
    }
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = dict(
        con.execute(
            "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    assert len(got) == len(exp) == 600
    for lid, rid in exp.items():
        g = got[lid]
        assert (rid is None and g is None) or g == rid, (lid, g, rid)
