"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm): position-robust local fingerprint
selection for near-duplicate / overlap detection.

Every document is reduced to the set of window-minimum k-gram hashes:
hash each word k-gram, slide a window of ``w`` consecutive k-gram
hashes, keep the minimum of each window. The guarantee (the paper's
"local" property): any shared substring of at least k + w - 1 tokens
contributes at least one IDENTICAL selected fingerprint to both
documents, while the expected density of selected fingerprints is
2/(w+1) — an ~(w+1)/2x reduction of the n-gram set with a hard
recall floor, which is what makes it the classic plagiarism /
clone-detection fingerprint (vs. MinHash, which has no per-substring
guarantee).

Spark-first design (100 TB shape):

- k-gram generation is the shared JVM tokenizer (norm_ws + split +
  sequence/slice/array_join) — whole-stage codegen, no Python;
- the k-gram hash is ENGINE-PORTABLE: the first 15 hex digits of
  md5(ngram) as a 60-bit non-negative BIGINT, so a SQL engine
  (DuckDB oracle) recomputes every fingerprint bit-for-bit;
- window-minimum selection is a plain window function PARTITIONED BY
  document — per-doc partitions, so the shuffle is (id, pos, h) rows
  hash-distributed by doc and no executor ever sees more than one
  document's gram stream at a time (docs are bounded; the corpus
  isn't);
- pair generation joins on the selected fingerprint with a
  document-frequency cap (boilerplate fingerprints shared by > max_df
  docs are dropped on BOTH sides — the standard MOSS noise filter and
  the same hot-bucket bound as dedup.cap_buckets), so bucket fan-out
  is bounded and the join never degenerates to all-pairs.

No reference counterpart (qcore.c has no text layer); complements
minhash (operators/dedup.py) and simhash with the third classic
fingerprint family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import norm_ws

__all__ = ["winnow_fingerprints", "winnow_dup_pairs"]


def _portable_hash60(col):
    """First 15 hex digits of md5 as a non-negative 60-bit bigint —
    identical in Spark (conv) and DuckDB (CAST(concat('0x', ...)))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, fp): the DISTINCT winnowed fingerprint set per document.

    A document with fewer than k + w - 1 tokens (i.e. fewer than w
    k-grams) yields no rows — there is no complete window, matching
    the paper's definition (a shorter doc has no guarantee anyway).

    The token array is materialized ONCE through a projection
    boundary before the per-position transform (CollapseProject would
    otherwise re-run the regex split per gram — see CLAUDE.md /
    contamination.word_ngrams for the measured 5x).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    toks = F.split(norm_ws(text_col), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    tk = F.col("__toks")
    n_grams = F.size(tk) - (k - 1)
    ks = F.when(F.size(tk) >= k, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    ngs = F.transform(ks, lambda p: F.array_join(F.slice(tk, p, k), " "))
    grams = base.select(
        "id",
        n_grams.alias("__n"),
        F.posexplode(ngs).alias("pos", "ng"),
    ).select("id", "__n", "pos", _portable_hash60(F.col("ng")).alias("h"))
    # window minimum over w consecutive gram hashes; only positions
    # that start a COMPLETE window select a fingerprint
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    sel = grams.select(
        "id",
        "pos",
        "__n",
        F.min("h").over(win).alias("fp"),
    ).where(F.col("pos") <= F.col("__n") - w)
    return sel.select("id", "fp").distinct()


def winnow_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowed fingerprints, after dropping fingerprints
    that occur in more than ``max_df`` distinct documents (MOSS's
    boilerplate filter; also the hot-bucket cap that keeps the
    fingerprint equi-join's per-key fan-out <= max_df(max_df-1)/2 at
    any corpus size).
    """
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("fp")
    )
    kept = fps.join(rare, "fp")
    a = kept.select(F.col("fp"), F.col("id").alias("id_a"))
    b = kept.select(F.col("fp"), F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
