"""Frequent co-occurring term pairs — the bounded first pass of
market-basket / association-rule mining over a document corpus.

The naive pair explosion is O(tokens_per_doc^2) per document —
unbounded on web text. The apriori downward-closure observation makes
it tractable: a pair can only be frequent if both members are, so the
pass (1) computes document frequencies, (2) keeps the top ``head_k``
terms (broadcast — a few KB), (3) semi-joins the distinct (doc, term)
table against the head vocabulary, and only then (4) self-joins on
doc_id. Per-doc pair fan-out is bounded by head_k^2 regardless of
document length, the self-join is one doc-keyed shuffle, and the pair
groupBy combines map-side. Deterministic end to end: head-vocab and
result ordering carry total tie-breaks (df desc, term asc), so any SQL
engine reproduces the exact pair list.

Public methodology (Agrawal & Srikant 1994 apriori pruning); no
reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tfidf import document_frequencies, term_frequencies


def cooccurring_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    head_k: int = 40,
    top_n: int = 20,
) -> DataFrame:
    """(term_a, term_b, n_docs): the ``top_n`` most frequently
    co-occurring unordered head-vocabulary term pairs by distinct
    document count."""
    tf = term_frequencies(df, text_col, id_col)  # distinct (id, term)
    head = (
        document_frequencies(tf)
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(head_k)
        .select("term")
    )
    dt = tf.join(F.broadcast(head), "term").select("id", "term")
    a = dt.select("id", F.col("term").alias("term_a"))
    b = dt.select("id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return pairs.orderBy(
        F.col("n_docs").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(top_n)
