"""Benchmark-contamination detection (operators/contamination.py):
n-gram generation semantics, planted-overlap detection, plan shape
(broadcast semi-join, no corpus shuffle before the probe).
"""

from pyspark.sql import functions as F

from q_digest_spark.operators.contamination import (
    contamination_report,
    duplicate_spans,
    word_ngrams,
)


def test_word_ngrams_positions_and_short_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "  x \t y  "),   # normalizes to 'x y' -> too short for n=3
            (3, "p q r"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id"], r["ng"])
        for r in word_ngrams(df, "text", "doc_id", n=3).collect()
    }
    assert got == {(1, "a b c"), (1, "b c d"), (3, "p q r")}


def test_word_ngrams_case_and_whitespace_normalized(spark):
    df = spark.createDataFrame([(1, "The\nQuick  BROWN fox")], "doc_id long, text string")
    got = [r["ng"] for r in word_ngrams(df, "text", "doc_id", n=4).collect()]
    assert got == ["the quick brown fox"]


def test_contamination_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma delta yy"),       # one 4-gram hit
            (2, "beta gamma delta epsilon zeta tail"), # two 4-gram hits
            (3, "completely unrelated text with words"),
            (4, "alpha beta gamma"),                   # too short for n=4
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r["n_hits"]
        for r in contamination_report(corpus, bench, "text", "doc_id", n=4).collect()
    }
    assert got == {1: 1, 2: 2}


def test_contamination_duplicate_ngrams_counted_once(spark):
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b c z a b c z a b c")], "doc_id long, text string"
    )
    got = contamination_report(corpus, bench, "text", "doc_id", n=3).collect()
    assert [(r["id"], r["n_hits"]) for r in got] == [(1, 1)]


def test_duplicate_spans_planted(spark):
    # doc 1 and 2 share 'one two three'; doc 3 repeats its own trigram
    # at two positions (counts: both positions are dup spans); doc 4
    # has all-unique trigrams; doc 5 is too short for n=3 -> no row.
    df = spark.createDataFrame(
        [
            (1, "one two three alpha"),
            (2, "zz one two three"),
            (3, "r s t r s t"),
            (4, "p q r s"),
            (5, "a b"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicate_spans(df, "text", "doc_id", n=3).collect()
    }
    # doc 3 trigrams: 'r s t','s t r','t r s','r s t' -> 'r s t' twice
    assert got == {1: (2, 1), 2: (2, 1), 3: (4, 2), 4: (2, 0)}


def test_duplicate_spans_no_dups(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    got = {
        r["id"]: r["n_dup_spans"]
        for r in duplicate_spans(df, "text", "doc_id", n=2).collect()
    }
    assert got == {1: 0, 2: 0}


def test_contamination_plan_broadcast_probe(spark, sf_test):
    docs = spark.read.parquet(f"{sf_test}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 13 == 0)
    plan = (
        contamination_report(docs, bench, "text", "doc_id", n=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # corpus side reaches the probe without any shuffle: the join's
    # LEFT branch (': ' tree prefix below BroadcastHashJoin) must hold
    # no Exchange — only the broadcast build side may shuffle
    probe_side = plan.split("BroadcastHashJoin")[1]
    left_branch = [
        l for l in probe_side.splitlines() if l.lstrip().startswith(":")
    ]
    assert left_branch, plan
    bad = [l for l in left_branch if "Exchange" in l]
    assert not bad, bad


# ----------------------------------------------- variable-length spans
def _spans(spark, rows, n=4, min_tokens=8):
    from q_digest_spark.operators.contamination import duplicate_maximal_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_maximal_spans(df, "text", "doc_id", n=n, min_tokens=min_tokens)
    return {
        (r["id"], r["span_start"], r["span_tokens"]) for r in got.collect()
    }


def test_maximal_span_reconstructs_planted_duplicate(spark):
    # a 10-token span duplicated verbatim across two docs, unique
    # elsewhere: every 4-gram window inside it is duplicated, so the
    # merged run must cover exactly the 10 tokens in both docs
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5 a6"),
        (2, f"b1 b2 {shared} b3 b4"),
    ]
    got = _spans(spark, rows, n=4, min_tokens=8)
    assert got == {(1, 4, 10), (2, 3, 10)}


def test_spans_below_threshold_dropped(spark):
    # one duplicated window = exactly n tokens < min_tokens → no rows
    shared = "x1 x2 x3 x4"
    rows = [(1, f"a1 a2 {shared} a3"), (2, f"b1 {shared} b2 b3")]
    assert _spans(spark, rows, n=4, min_tokens=8) == set()
    # threshold is inclusive: a span of exactly min_tokens survives
    shared8 = "y1 y2 y3 y4 y5 y6 y7 y8"
    rows = [(1, f"a1 {shared8} a2"), (2, f"b1 b2 {shared8}")]
    got = _spans(spark, rows, n=4, min_tokens=8)
    assert got == {(1, 2, 8), (2, 3, 8)}


def test_disjoint_duplicate_regions_stay_separate_spans(spark):
    # two shared regions separated by unique tokens must NOT chain
    s1 = "p1 p2 p3 p4 p5 p6 p7 p8"
    s2 = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [
        (1, f"{s1} u1 u2 u3 u4 {s2}"),
        (2, f"{s1} v1 v2 v3 v4 {s2}"),
    ]
    got = _spans(spark, rows, n=4, min_tokens=8)
    assert got == {
        (1, 1, 8), (1, 13, 8),
        (2, 1, 8), (2, 13, 8),
    }


def test_within_doc_repetition_counts_as_duplicate(spark):
    # multiplicity >= 2 anywhere INCLUDING the same doc: a doc that
    # repeats its own 8-token block twice gets both occurrences
    block = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(1, f"{block} z1 z2 z3 z4 {block}")]
    got = _spans(spark, rows, n=4, min_tokens=8)
    assert got == {(1, 1, 8), (1, 13, 8)}


def test_full_doc_duplicate_is_one_maximal_span(spark):
    txt = " ".join(f"w{i}" for i in range(30))
    rows = [(1, txt), (2, txt)]
    got = _spans(spark, rows, n=4, min_tokens=20)
    assert got == {(1, 1, 30), (2, 1, 30)}
