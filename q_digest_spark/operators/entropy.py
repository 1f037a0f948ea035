"""Per-group Shannon entropy of the token unigram distribution — the
corpus-quality signal that separates natural prose (high entropy)
from boilerplate / template / machine-generated spam (low entropy),
used as a cheap gate in web-scale training-data pipelines.

H(g) = ln(n_g) - (1/n_g) * sum_term c * ln(c)   (nats)

computed entirely in JVM column algebra from the same canonical
whitespace/lower tokenization the TF-IDF and OOV operators share
(functions/text.norm_ws), so the DuckDB oracle mirrors it verbatim.

Plan shape at corpus scale: one shuffle keyed (group, term) with
map-side combine (duplicate tokens collapse before the exchange),
then one tiny (group)-keyed aggregate — no Python anywhere, no
vocabulary ever collected. The identity ln-sum form means the state
per (group, term) is a single count: entropy needs no second pass
over the data.

No reference counterpart (qcore.c has no text layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import norm_ws


def token_entropy(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """(group, n_tokens, n_types, entropy) — token count, distinct
    token (type) count, and Shannon entropy in nats of each group's
    unigram distribution. Empty tokens dropped, same contract as
    operators/tfidf.term_frequencies."""
    toks = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(F.split(norm_ws(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    cnt = toks.groupBy("g", "term").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("g")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(
                F.col("c").cast("double") * F.log(F.col("c").cast("double"))
            ).alias("_s"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "n_types",
            (
                F.log(F.col("n_tokens").cast("double"))
                - F.col("_s") / F.col("n_tokens").cast("double")
            ).alias("entropy"),
        )
    )
