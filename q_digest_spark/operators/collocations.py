"""Collocation mining: PMI-ranked word bigrams.

Pointwise mutual information (Church & Hanks, Computational
Linguistics 1990 — public literature) scores how much more often a
bigram occurs than its unigram frequencies predict:
PMI(x, y) = log[ p(xy) / (p(x) p(y)) ]. log is monotone, so ranking
by the RATIO needs no floats at all — this module reports

    pmi_ratio_milli = floor( 1000 * c_xy * N_u^2 / (N_b * c_x * c_y) )

(the ratio scaled by 1000, exact integer arithmetic in decimal(38,0)
so a 100 TB corpus's N_u^2 ~ 1e24 term cannot overflow), where c_xy
is the bigram occurrence count, c_x / c_y the unigram occurrence
counts, N_b / N_u the bigram / unigram totals. All terms are
non-negative, so truncating division agrees between Spark's DIV and
DuckDB's // (the CLAUDE.md signed-quantization trap never binds).

Tokenization is shared with the contamination / vocabulary operators
(operators/contamination.word_ngrams: whitespace-normalized lowercase
split), so collocation counts are consistent with every other token
statistic in the engine. Tokens cannot contain spaces, so splitting
the stored bigram string on ' ' to recover (x, y) is lossless.

Plan shape: the corpus is scanned TWICE (unigram rollup, bigram
rollup) — both are map-side-combined groupBy-counts on narrow keys;
the two total counts are 1-row aggregates broadcast into the scoring
projection; the unigram table joins the bigram table twice on the
token key (hash joins; at web scale the min-count prefilter on c_xy
shrinks the probe side first, and the unigram side prunes to tokens
that actually lead/trail a surviving bigram via the join itself).
Nothing row-scaled reaches the driver.

No reference counterpart: the C reference (qcore.c) has no text
layer; this is engine-native functionality for the web-text payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import spill_parquet
from .contamination import word_ngrams


def pmi_bigrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 5,
) -> DataFrame:
    """(x, y, c_xy, pmi_ratio_milli) for every bigram occurring at
    least ``min_count`` times. Rank by (pmi_ratio_milli desc, x, y)
    for the classic collocation list; the integer score makes that
    order engine-bit-identical."""
    # Both rollups feed multiple plan arms (totals agg + the scoring
    # joins); spilling runs the tokenization exactly once per rollup
    # and gives Catalyst real size stats for the scoring joins.
    uni = spill_parquet(
        word_ngrams(df, text_col, id_col, n=1)
        .groupBy(F.col("ng").alias("tok"))
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        "qds_pmi_uni_",
    )
    bg_all = spill_parquet(
        word_ngrams(df, text_col, id_col, n=2)
        .groupBy("ng")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy")),
        "qds_pmi_bg_",
    )
    # N_b is the total over ALL bigrams — sum before the min_count
    # filter, or p(xy) would be conditioned on frequent-bigram mass.
    totals = F.broadcast(
        uni.agg(F.sum("c").cast("long").alias("n_uni")).crossJoin(
            bg_all.agg(F.sum("c_xy").cast("long").alias("n_bi"))
        )
    )
    bg = bg_all.where(F.col("c_xy") >= min_count)
    parts = bg.select(
        F.col("ng"),
        F.col("c_xy"),
        F.split(F.col("ng"), " ")[0].alias("x"),
        F.split(F.col("ng"), " ")[1].alias("y"),
    )
    scored = (
        parts.join(uni.select(F.col("tok").alias("x"), F.col("c").alias("cx")), "x")
        .join(uni.select(F.col("tok").alias("y"), F.col("c").alias("cy")), "y")
        .crossJoin(totals)
    )
    return scored.select(
        "x",
        "y",
        "c_xy",
        F.expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * c_xy * n_uni * n_uni) DIV "
            "(CAST(n_bi AS DECIMAL(38,0)) * cx * cy) AS BIGINT)"
        ).alias("pmi_ratio_milli"),
    )
