"""Inverted-index posting segments (operators/invindex.py)."""

import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.invindex import build_posting_segments, term_stats


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-invindex")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "common " * (i % 3 + 1) + f"rare{i}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segments_bounded_and_ordered(spark, docs):
    seg = build_posting_segments(docs, "text", "doc_id", range_size=8)
    rows = seg.where("term = 'common'").orderBy("seg").collect()
    # 20 docs, range 8 -> segments 0,1,2 with 8+8+4 docs
    assert [r["seg"] for r in rows] == [0, 1, 2]
    assert [r["n_docs"] for r in rows] == [8, 8, 4]
    for r in rows:
        p = [x["doc"] for x in r["postings"]]
        assert p == sorted(p)
        assert all(d // 8 == r["seg"] for d in p)
    # concatenation across segments reconstructs the global list
    full = [x["doc"] for r in rows for x in r["postings"]]
    assert full == list(range(20))


def test_term_stats_match_direct_aggregation(spark, docs):
    seg = build_posting_segments(docs, "text", "doc_id", range_size=8)
    got = {r["term"]: r.asDict() for r in term_stats(seg).collect()}
    c = got["common"]
    assert (c["df"], c["min_doc"], c["max_doc"]) == (20, 0, 19)
    assert c["doc_sum"] == sum(range(20))
    # cf counts token occurrences: doc i contributes i % 3 + 1
    assert c["cf"] == sum(i % 3 + 1 for i in range(20))
    r7 = got["rare7"]
    assert (r7["df"], r7["cf"], r7["min_doc"], r7["max_doc"], r7["doc_sum"]) == (
        1, 1, 7, 7, 7,
    )


def test_merge_segments_equals_full_rebuild(spark, docs):
    from pyspark.sql import functions as F

    even = build_posting_segments(
        docs.where(F.col("doc_id") % 2 == 0), "text", "doc_id", range_size=8
    )
    odd = build_posting_segments(
        docs.where(F.col("doc_id") % 2 == 1), "text", "doc_id", range_size=8
    )
    from q_digest_spark.operators.invindex import merge_segments

    merged = merge_segments(even, odd)
    full = build_posting_segments(docs, "text", "doc_id", range_size=8)

    def snap(df):
        return {
            (r["term"], r["seg"]): (
                [(p["doc"], p["tf"]) for p in r["postings"]],
                r["n_docs"],
                r["sum_tf"],
            )
            for r in df.collect()
        }

    assert snap(merged) == snap(full)


def test_merge_sums_tf_for_duplicate_docs(spark, docs):
    seg = build_posting_segments(docs, "text", "doc_id", range_size=8)
    from q_digest_spark.operators.invindex import merge_segments

    doubled = merge_segments(seg, seg)
    base = {
        (r["term"], r["seg"]): r for r in seg.collect()
    }
    for r in doubled.collect():
        b = base[(r["term"], r["seg"])]
        assert r["n_docs"] == b["n_docs"]
        assert r["sum_tf"] == 2 * b["sum_tf"]


def test_conjunctive_query_matches_python_oracle(spark, docs):
    from q_digest_spark.operators.invindex import conjunctive_query

    seg = build_posting_segments(docs, "text", "doc_id", range_size=8)
    got = sorted(
        r["doc"] for r in conjunctive_query(seg, ["common", "rare7"]).collect()
    )
    assert got == [7]
    got_all = sorted(
        r["doc"] for r in conjunctive_query(seg, ["common"]).collect()
    )
    assert got_all == list(range(20))


def test_bm25_matches_local_reference(spark):
    import math

    from q_digest_spark.operators.invindex import bm25_topk, doc_lengths

    corpus = {
        0: "apple banana apple",
        1: "apple cherry",
        2: "banana banana banana cherry",
        3: "date",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    seg = build_posting_segments(docs, "text", "doc_id", range_size=2)
    dl = doc_lengths(docs, "text", "doc_id")
    got = [
        (r["doc"], r["bm25_q"])
        for r in bm25_topk(seg, dl, ["apple", "banana"], k=4).collect()
    ]

    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = float(sum(len(t) for t in toks.values())) / float(n)
    want = {}
    for term in ("apple", "banana"):
        df = sum(1 for t in toks.values() if term in t)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * len(t)) / avgdl))
            want[d] = want.get(d, 0) + int(round(s * 1e6))
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == expect
    # doc 3 contains neither query term: absent from scores
    assert 3 not in dict(got)


def test_posting_gap_stats_local_oracle(spark):
    import math

    from q_digest_spark.operators.invindex import posting_gap_stats

    # 'common' in every doc 0..19 (gaps all 1, crossing segment
    # boundaries at range 8); 'sparse' in docs 0, 3, 11 (gaps 3, 8);
    # 'once' only in doc 5 (no gaps -> sentinel)
    rows = []
    for i in range(20):
        t = "common"
        if i in (0, 3, 11):
            t += " sparse"
        if i == 5:
            t += " once"
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seg = build_posting_segments(docs, "text", "doc_id", range_size=8)
    got = {r["term"]: r.asDict() for r in posting_gap_stats(seg).collect()}

    def gamma(g):
        return 2 * int(math.floor(math.log2(g))) + 1

    c = got["common"]
    assert (c["df"], c["n_gaps"], c["min_gap"], c["max_gap"]) == (20, 19, 1, 1)
    assert c["gamma_bits"] == 19 * gamma(1)
    s = got["sparse"]
    assert (s["df"], s["n_gaps"], s["min_gap"], s["max_gap"]) == (3, 2, 3, 8)
    assert s["gamma_bits"] == gamma(3) + gamma(8)
    o = got["once"]
    assert (o["df"], o["n_gaps"], o["gamma_bits"], o["min_gap"], o["max_gap"]) == (
        1, 0, 0, -1, -1,
    )


def test_positional_phrase_query(spark):
    from q_digest_spark.operators.invindex import (
        phrase_query,
        positional_postings,
    )

    df = spark.createDataFrame(
        [
            (1, "hash join beats sort merge join"),
            (2, "hash  Join hash join hash join"),  # case+ws normalize
            (3, "join hash"),  # reversed: no match
        ],
        "doc_id long, text string",
    )
    post = positional_postings(df, "text", "doc_id")
    got = {
        r["doc"]: r["n_matches"]
        for r in phrase_query(post, ["hash", "join"]).collect()
    }
    assert got == {1: 1, 2: 3}
    # 3-term phrase
    got3 = {
        r["doc"]: r["n_matches"]
        for r in phrase_query(post, ["hash", "join", "beats"]).collect()
    }
    assert got3 == {1: 1}


def test_proximity_query(spark):
    from q_digest_spark.operators.invindex import (
        positional_postings,
        proximity_query,
    )
    import pytest

    df = spark.createDataFrame(
        [
            (1, "vector x merge"),            # dist 2: hit
            (2, "vector a b c d merge"),      # dist 5: miss at w=3
            (3, "merge vector merge"),        # dists 1 and 1: 2 pairs
        ],
        "doc_id long, text string",
    )
    post = positional_postings(df, "text", "doc_id")
    got = {
        r["doc"]: r["n_pairs"]
        for r in proximity_query(post, "vector", "merge", 3).collect()
    }
    assert got == {1: 1, 3: 2}
    with pytest.raises(ValueError):
        proximity_query(post, "merge", "merge", 3)
