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


def lift_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    head_k: int = 40,
    min_pair_docs: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """(term_a, term_b, n_docs, df_a, df_b, lift_ppm): head-vocabulary
    pairs ranked by LIFT — P(a,b) / (P(a) P(b)) — the association-
    strength companion to the support ranking of cooccurring_pairs
    (same Agrawal-Srikant pruning; lift is the standard
    interestingness measure on top of it).

    lift = N * c_ab / (c_a * c_b) is a ratio of int64 counts, so the
    ranking key is quantized integer-exactly as
    lift_ppm = (1_000_000 * N * c_ab) div (c_a * c_b) — no float ever
    touches the ordering, and any SQL engine reproduces it bit-for-bit
    (the numerator stays under 2^63 for corpora up to ~10^6 docs at
    ppm precision; drop to ppt for larger N). Tie-break
    (lift_ppm desc, term_a asc, term_b asc) is total. Same scale shape
    as cooccurring_pairs: head_k^2-bounded fan-out, one doc-keyed
    self-join, map-side-combined pair counts."""
    tf = term_frequencies(df, text_col, id_col)
    n = tf.select("id").distinct().count()
    dfc = document_frequencies(tf)
    head = (
        dfc.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(head_k)
    )
    dt = tf.join(F.broadcast(head.select("term")), "term").select("id", "term")
    a = dt.select("id", F.col("term").alias("term_a"))
    b = dt.select("id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_docs)
    )
    da = head.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = head.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    scored = (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .withColumn(
            "lift_ppm",
            F.expr(f"CAST((1000000 * {int(n)} * n_docs) div (df_a * df_b) AS BIGINT)"),
        )
    )
    return (
        scored.select("term_a", "term_b", "n_docs",
                      F.col("df_a").cast("long").alias("df_a"),
                      F.col("df_b").cast("long").alias("df_b"),
                      "lift_ppm")
        .orderBy(F.col("lift_ppm").desc(), F.col("term_a").asc(),
                 F.col("term_b").asc())
        .limit(top_n)
    )
