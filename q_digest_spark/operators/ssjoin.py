"""Exact set-similarity self-join via prefix filtering — the
LOSSLESS counterpart to MinHash/LSH near-dup: every pair with Jaccard
>= t is returned, no probabilistic recall.

Prefix-filter principle (Chaudhuri, Ganti & Kaushik, "A Primitive
Operator for Similarity Joins in Data Cleaning", ICDE 2006; Xiao et
al., "Efficient Similarity Joins for Near Duplicate Detection", WWW
2008 — public literature): order every document's distinct tokens by
a global canonical order (ascending document frequency, rarest
first), and keep only the first p = n - ceil(t*n) + 1 tokens as its
PREFIX. Two sets with Jaccard >= t must share at least one prefix
token — so blocking on prefix tokens is exact, and because prefixes
are the RAREST tokens, block sizes stay small exactly where the naive
token-join explodes (stopwords never enter a prefix at any realistic
threshold).

Scale shape, all JVM: token df is one aggregate; per-doc token
ordering is sort_array over (df, term) structs INSIDE each row (no
global rank window — the canonical order needs no global sort);
prefix fan-out is p per doc (p <= (1-t)n + 1, e.g. ~10% of tokens at
t=0.9); candidate generation is an equi-join on prefix token;
verification intersects the two docs' sorted token arrays
(array_intersect) under integer thresholding
1000*inter >= ppt*(na + nb - inter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import spill_parquet
from .tfidf import document_frequencies, term_frequencies


def jaccard_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_ppt: int = 900,
) -> DataFrame:
    """(id_a, id_b, jacc_ppt): EVERY unordered pair whose distinct-
    token Jaccard >= threshold_ppt/1000, jacc_ppt the integer
    per-mille floor. Exact: the prefix filter is lossless by the
    Chaudhuri et al. theorem, and the verifier is integer-thresholded
    so any SQL engine reproduces the accept/reject decision."""
    tf = term_frequencies(df, text_col, id_col).select("id", "term").distinct()
    dfc = document_frequencies(tf)
    ranked = tf.join(dfc, "term").select(
        "id", F.struct(F.col("df"), F.col("term")).alias("rt")
    )
    docs = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list("rt")).alias("rts")
    )
    n = F.size("rts")
    # p = n - ceil(t*n) + 1, ceil via integer arithmetic
    p = n - F.expr(f"CAST(({threshold_ppt} * size(rts) + 999) div 1000 AS INT)") + F.lit(1)
    docs = docs.select(
        "id",
        F.transform("rts", lambda s: s["term"]).alias("toks"),
        F.transform(F.slice("rts", 1, p), lambda s: s["term"]).alias("prefix"),
    )
    # three plan arms consume docs (prefix fan-out + both verify
    # sides); spill once so the tokenize/df/sort upstream runs once
    docs = spill_parquet(docs, "qds_ssjoin_docs_")
    pre = docs.select("id", F.explode("prefix").alias("term"))
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), (F.col("a.term") == F.col("b.term"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
    db = docs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("i"),
            F.size("ta").cast("long").alias("na"),
            F.size("tb").cast("long").alias("nb"),
        )
        .where(
            F.lit(1000) * F.col("i")
            >= F.lit(threshold_ppt) * (F.col("na") + F.col("nb") - F.col("i"))
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        F.expr("CAST(1000 * i div (na + nb - i) AS BIGINT)").alias("jacc_ppt"),
    )


def containment_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_ppt: int = 950,
    block_col: str | None = None,
) -> DataFrame:
    """Asymmetric CONTAINMENT self-join: every ORDERED pair (a, b)
    with |tokens(a) ∩ tokens(b)| >= (threshold_ppt/1000) * |tokens(a)|
    — "a is (nearly) quoted inside b". The quote/boilerplate/superset
    detector that Jaccard misses: a 30-token disclaimer pasted into a
    3000-token page has tiny Jaccard but containment 1.0.

    Prefix filtering applies one-sidedly (Chaudhuri et al. 2006): only
    the CONTAINED side's rarest p_a = n_a - ceil(t*n_a) + 1 tokens
    block; the containing side is probed on all its tokens, with the
    length bound 1000*n_b >= t*n_a pushed into the candidate join.
    Verification is array_intersect under the integer threshold
    1000*i >= ppt*n_a — lossless, engine-reproducible.

    ``block_col`` optionally restricts pairs to equal values of a
    grouping column (e.g. host) — pushed into the join key, so the
    blocking shuffle partitions by (block, term) and cross-host
    candidates never materialize.
    """
    tf = term_frequencies(df, text_col, id_col).select("id", "term").distinct()
    if block_col is not None:
        blk = df.select(
            F.col(id_col).alias("id"), F.col(block_col).alias("__blk")
        ).distinct()
        tf = tf.join(blk, "id")
    else:
        tf = tf.withColumn("__blk", F.lit(0))
    dfc = document_frequencies(tf.select("id", "term"))
    ranked = tf.join(dfc, "term").select(
        "id", "__blk", F.struct(F.col("df"), F.col("term")).alias("rt")
    )
    docs = ranked.groupBy("id", "__blk").agg(
        F.sort_array(F.collect_list("rt")).alias("rts")
    )
    n = F.size("rts")
    p = n - F.expr(
        f"CAST(({threshold_ppt} * size(rts) + 999) div 1000 AS INT)"
    ) + F.lit(1)
    docs = docs.select(
        "id",
        "__blk",
        F.transform("rts", lambda s: s["term"]).alias("toks"),
        F.transform(F.slice("rts", 1, p), lambda s: s["term"]).alias("prefix"),
    )
    # four plan arms consume docs (prefix + full probe + both verify
    # sides); spill once so the tokenize/df/sort upstream runs once
    docs = spill_parquet(docs, "qds_contain_docs_")
    pre = docs.select(
        "id", "__blk", F.size("toks").alias("na"), F.explode("prefix").alias("term")
    )
    full = docs.select(
        F.col("id").alias("id_b"),
        "__blk",
        F.size("toks").alias("nb"),
        F.explode("toks").alias("term"),
    )
    cand = (
        pre.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.id") != F.col("b.id_b"))
            & (F.lit(1000) * F.col("b.nb")
               >= F.lit(threshold_ppt) * F.col("a.na")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id_b").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
    db = docs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("i"),
            F.size("ta").cast("long").alias("na"),
        )
        .where(F.lit(1000) * F.col("i") >= F.lit(threshold_ppt) * F.col("na"))
    )
    return verified.select(
        "id_a",
        "id_b",
        F.expr("CAST(1000 * i div na AS BIGINT)").alias("cont_ppt"),
    )
