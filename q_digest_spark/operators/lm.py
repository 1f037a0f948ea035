"""Character-bigram language-model quality scoring — the cheap,
tokenizer-free stand-in for the KenLM-perplexity filter of
CCNet-style pipelines (public methodology: Wenzek et al. 2020 score
documents with a per-language LM and drop the worst tail; here the LM
is a char bigram model trained on the corpus itself, so the whole
thing is two Spark passes and needs no external model file).

Per language: p(b | c1) = (cnt(b) + 1) / (cnt(c1·) + V) with
add-one smoothing, V = #distinct second characters observed for the
language. A document's score is the mean log-probability of its
char bigrams — low = unlike the language's character statistics
(mojibake, boilerplate soup, wrong-language text).

Scale shape:
- bigram extraction is pure JVM column algebra over the canonical
  ``norm_ws`` text (sequence/transform/substr inside codegen);
- model building is ONE groupBy(lang, bigram) with map-side combine —
  the model is O(langs · charset²) rows, broadcast back;
- scoring is a broadcast join + groupBy(doc) whose partial
  aggregation collapses each document's bigrams map-side (they are
  co-partitioned with the source row), so the shuffle carries one
  partial row per doc per partition.

The log arithmetic is float; graded queries quantize the per-doc mean
(floor(avg·1000 + 0.5)) so last-ulp libm differences cannot flip a
value (CLAUDE.md float-grading rule). No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import norm_ws


def char_bigrams(df: DataFrame, text_col: str, lang_col: str, id_col: str) -> DataFrame:
    """Exploded (id, lang, b) char bigrams of the normalized text;
    docs shorter than 2 normalized chars yield no rows."""
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(lang_col).alias("lang"),
            norm_ws(text_col).alias("__nt"),
        )
        .where(
            F.col("lang").isNotNull()
            & F.col("__nt").isNotNull()
            & (F.length("__nt") >= 2)
        )
    )
    ks = F.sequence(F.lit(1), F.length("__nt") - 1)
    bgs = F.transform(ks, lambda i: F.substr(F.col("__nt"), i, F.lit(2)))
    return base.select("id", "lang", F.explode(bgs).alias("b"))


def char_bigram_model(bg: DataFrame) -> DataFrame:
    """(lang, b, logp): add-one-smoothed conditional log-probs from
    exploded bigrams. Small (langs · charset² rows) — broadcast it."""
    m = bg.groupBy("lang", "b").agg(F.count(F.lit(1)).alias("cnt"))
    pref = (
        m.groupBy("lang", F.substring("b", 1, 1).alias("c1"))
        .agg(F.sum("cnt").alias("pcnt"))
    )
    vs = m.groupBy("lang").agg(
        F.countDistinct(F.substring("b", 2, 1)).alias("v")
    )
    return (
        m.withColumn("c1", F.substring("b", 1, 1))
        .join(pref, ["lang", "c1"])
        .join(vs, "lang")
        .select(
            "lang",
            "b",
            (
                F.log(F.col("cnt").cast("double") + 1)
                - F.log((F.col("pcnt") + F.col("v")).cast("double"))
            ).alias("logp"),
        )
    )


def lm_quality_scores(
    df: DataFrame, text_col: str, lang_col: str, id_col: str
) -> DataFrame:
    """(id, lang, n_bigrams, avg_logp): per-document mean bigram
    log-prob under the language's own corpus-trained model. Because
    the model is trained on the very corpus being scored, every doc
    bigram exists in the model — the join is inner with no OOV branch.
    """
    bg = char_bigrams(df, text_col, lang_col, id_col)
    model = char_bigram_model(bg)
    return (
        bg.join(F.broadcast(model), ["lang", "b"])
        .groupBy("id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").alias("__s"),
        )
        .select(
            "id",
            "lang",
            "n_bigrams",
            (F.col("__s") / F.col("n_bigrams")).alias("avg_logp"),
        )
    )
