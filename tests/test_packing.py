"""Sequence packing (operators/packing.py): greedy-contiguous
invariants vs a local replay of the same deterministic order.
"""

import hashlib

from pyspark.sql import functions as F

from q_digest_spark.operators.packing import pack_documents, pack_summary


def _local_order(ids, salt="pack"):
    return sorted(ids, key=lambda i: (hashlib.md5(f"{i}:{salt}".encode()).hexdigest(), i))


def test_packing_matches_local_greedy(spark):
    rows = [(i, "s", 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long").repartition(8)
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_documents(df, "doc_id", "toks", "lang", budget=100).collect()
    }
    toks = {i: t for i, _, t in rows}
    cum = 0
    exp = {}
    for i in _local_order(list(toks)):
        exp[i] = cum // 100
        cum += toks[i]
    assert got == exp


def test_packing_budget_and_overflow_invariants(spark):
    rows = [(i, "x", 30) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    packed = pack_documents(df, "doc_id", "toks", "lang", budget=100)
    s = pack_summary(packed, "lang", "toks").collect()
    by_pack = {r["pack_id"]: (r["n_docs"], r["total_tokens"]) for r in s}
    # every pack except the last holds >= budget tokens (it closed by
    # crossing the boundary) and < budget + max_doc_tokens
    last = max(by_pack)
    for pid, (n, tot) in by_pack.items():
        assert tot < 100 + 30, (pid, tot)
        if pid != last:
            assert tot >= 100 - 30 + 1, (pid, tot)
    assert sum(n for n, _ in by_pack.values()) == 100


def test_packing_strata_independent_and_null_excluded(spark):
    rows = [(1, "a", 50), (2, "a", 60), (3, "b", 70), (4, "b", None), (5, "b", 0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    got = pack_documents(df, "doc_id", "toks", "lang", budget=100).collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {1, 2, 3}
    # stratum b packs independently from a
    assert all(r["pack_id"] == 0 for r in got if r["lang"] == "b")


def test_packing_plan_no_global_sort(spark, sf_test):
    docs = spark.read.parquet(f"{sf_test}/documents.parquet").where(
        F.col("n_chars").isNotNull()
    )
    plan = (
        pack_documents(docs, "doc_id", "n_chars", "lang", budget=10_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Sort " in line and "global=true" in line:
            raise AssertionError(f"global sort in packing plan: {line}")
