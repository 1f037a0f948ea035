"""rare_token_stats: corpus-frequency OOV statistics — exact parity
with a pure-Python oracle and the broadcast-head-vocab plan shape."""

from collections import Counter

import pytest

from q_digest_spark.operators.tfidf import rare_token_stats

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on a log"),
    (3, "zyzzyva qwertyuiop the"),
    (4, "cat dog zyzzyva"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def python_oracle(min_df):
    df = Counter()
    for _, text in DOCS:
        for t in set(text.split()):
            df[t] += 1
    out = {}
    for doc_id, text in DOCS:
        toks = text.split()
        out[doc_id] = (
            len(toks),
            sum(1 for t in toks if df[t] < min_df),
        )
    return out

@pytest.mark.parametrize("min_df", [2, 3])
def test_matches_python_oracle(spark, docs_df, min_df):
    got = {
        r["id"]: (r["n_tokens"], r["n_rare"])
        for r in rare_token_stats(docs_df, "text", "doc_id", min_df).collect()
    }
    assert got == python_oracle(min_df)


def test_head_vocab_is_broadcast(spark, docs_df):
    plan = rare_token_stats(docs_df, "text", "doc_id", 2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the Zipf tail never builds a hash table


def test_cooccurring_pairs_planted(spark):
    """Planted baskets: pair counts are exact document co-occurrence
    counts, head-vocab pruning drops non-head terms, ordering is the
    deterministic (n_docs desc, term_a, term_b) total order."""
    from q_digest_spark.operators.itemsets import cooccurring_pairs

    docs = (
        [(i, "alpha beta gamma") for i in range(10)]
        + [(100 + i, "alpha beta") for i in range(5)]
        + [(200 + i, "gamma delta") for i in range(3)]
        + [(300, "rare1 rare2")]  # below the head cut at head_k=4
    )
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = [tuple(r) for r in cooccurring_pairs(df, "text", "doc_id", head_k=4, top_n=10).collect()]
    # df: alpha 15, beta 15, gamma 13, delta 3, rare* 1 -> head = {alpha, beta, delta, gamma}
    assert got == [
        ("alpha", "beta", 15),
        ("alpha", "gamma", 10),
        ("beta", "gamma", 10),
        ("delta", "gamma", 3),
    ]


def test_lift_pairs_local_oracle(spark):
    from q_digest_spark.operators.itemsets import lift_pairs

    # 10 docs: 'x y' together in 4 docs, x alone in 2, y alone in 2,
    # 'z' everywhere (high support, lift ~1)
    rows = []
    for i in range(4):
        rows.append((i, "x y z"))
    for i in range(4, 6):
        rows.append((i, "x z"))
    for i in range(6, 8):
        rows.append((i, "y z"))
    for i in range(8, 10):
        rows.append((i, "z"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["term_a"], r["term_b"], r["n_docs"], r["lift_ppm"])
        for r in lift_pairs(docs, "text", "doc_id", head_k=3,
                            min_pair_docs=2, top_n=10).collect()
    ]
    # df: z=10, x=6, y=6, N=10
    # (x,y): 1e6*10*4 div 36 = 1111111 ; (x,z): 1e6*10*6 div 60 = 1e6
    assert got[0] == ("x", "y", 4, 1111111)
    assert ("x", "z", 6, 1000000) in got
    assert ("y", "z", 6, 1000000) in got


def test_token_freq_octaves_python_oracle(spark):
    # counts chosen to straddle octave boundaries: 1 (oct 0), 2,3 (oct 1),
    # 4..7 (oct 2), 8 (oct 3) — incl. the 2^k-1 values float log2 misrounds
    from collections import Counter

    from q_digest_spark.operators.tfidf import token_freq_octaves

    words = (
        ["solo"] * 1 + ["pair"] * 2 + ["trio"] * 3 + ["quad"] * 4
        + ["seven"] * 7 + ["eight"] * 8
    )
    rows = [(i, " ".join(words[i::3])) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cnt = Counter(w for _, t in rows for w in t.split())
    oracle = Counter()
    mass = Counter()
    for w, c in cnt.items():
        o = c.bit_length() - 1
        oracle[o] += 1
        mass[o] += c
    got = {r["octave"]: (r["n_tokens"], r["occurrences"])
           for r in token_freq_octaves(df, "text").collect()}
    assert got == {o: (oracle[o], mass[o]) for o in oracle}
