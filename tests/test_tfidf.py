"""TF-IDF operators (operators/tfidf.py): counts vs a local oracle,
smoothed-IDF scoring, top-k ranking with WindowGroupLimit plan.
"""

import math
from collections import Counter

from pyspark.sql import functions as F

from q_digest_spark.operators.tfidf import (
    document_frequencies,
    term_frequencies,
    tfidf_top_terms,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat cat cat unique"),
    (4, "  Mixed \t CASE the\nCAT "),
]


def _local_tf():
    out = {}
    for i, t in DOCS:
        toks = [w for w in " ".join(t.lower().split()).split(" ") if w]
        for term, c in Counter(toks).items():
            out[(i, term)] = c
    return out


def test_term_and_document_frequencies(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    tf = term_frequencies(df, "text", "doc_id")
    got = {(r["id"], r["term"]): r["tf"] for r in tf.collect()}
    assert got == _local_tf()
    dfc = {r["term"]: r["df"] for r in document_frequencies(tf).collect()}
    exp = Counter(term for (_, term) in _local_tf())
    assert dfc == dict(exp)


def test_tfidf_top_terms_vs_local(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    tf = _local_tf()
    dfc = Counter(term for (_, term) in tf)
    n = len(DOCS)

    def score(i, term):
        return round(tf[(i, term)] * (math.log((n + 1) / (dfc[term] + 1)) + 1) * 1e6)

    by_doc = {}
    for r in got:
        by_doc.setdefault(r["id"], []).append((r["term"], r["tf"], r["score_q"]))
    for rows in by_doc.values():
        rows.sort(key=lambda x: (-x[2], x[0]))
    for i, _ in DOCS:
        terms = sorted(
            {t for (d, t) in tf if d == i},
            key=lambda t: (-score(i, t), t),
        )[:2]
        exp = [(t, tf[(i, t)], score(i, t)) for t in terms]
        assert by_doc[i] == exp, (i, by_doc[i], exp)


def test_tfidf_plan_window_group_limit(spark, sf_test):
    docs = spark.read.parquet(f"{sf_test}/documents.parquet")
    plan = (
        tfidf_top_terms(docs, "text", "doc_id", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan


def test_token_entropy_matches_local(spark):
    """token_entropy == plain-Python entropy over the same canonical
    tokenization, and degenerate single-token groups get H = 0."""
    import math
    from collections import Counter

    from q_digest_spark.operators.entropy import token_entropy

    docs = [
        ("en", "the cat sat on the  mat\tthe cat"),
        ("en", "a b c d a"),
        ("de", "der der der der"),          # low entropy
        ("fr", "unique"),                    # single token -> H = 0
    ]
    sdf = spark.createDataFrame(docs, "lang string, text string").repartition(3)
    got = {r["lang"]: r for r in token_entropy(sdf, "text", "lang").collect()}

    toks = {}
    for lang, text in docs:
        toks.setdefault(lang, []).extend(t for t in text.lower().split() if t)
    for lang, ts in toks.items():
        c = Counter(ts)
        n = len(ts)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        r = got[lang]
        assert r["n_tokens"] == n and r["n_types"] == len(c)
        assert abs(r["entropy"] - h) < 1e-12, (lang, r["entropy"], h)
    assert abs(got["fr"]["entropy"]) < 1e-12
