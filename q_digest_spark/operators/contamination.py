"""Benchmark-contamination detection: word n-gram overlap between a
huge corpus and a small benchmark/eval set.

The standard LLM-training hygiene check (e.g. GPT-3 appendix C /
PaLM-style 'dirty' document marking, public methodology): a corpus
document is contaminated when it shares at least one word n-gram
with any benchmark document. At 100 TB the corpus side dominates, so
the plan must never shuffle corpus n-grams:

- n-gram generation is pure JVM column algebra (lower/trim/split +
  sequence/transform/slice/array_join) inside whole-stage codegen —
  no Python, no UDF;
- benchmark n-grams are DISTINCT + hashed (xxhash64) and BROADCAST;
  the probe is a map-side BroadcastHashJoin against exploded corpus
  n-grams — zero shuffle of corpus data; the only shuffle is the
  final per-doc count aggregation over MATCHES (tiny).

Tokenization is the canonical whitespace normalization shared with
the DuckDB oracles (trim + collapse [ \t\n\r\f]+ to one space, then
split on single space), so a SQL engine reproduces the n-gram set
byte-for-byte.

No reference counterpart (qcore.c has no text layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import norm_ws


def word_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 7
) -> DataFrame:
    """Exploded (id, ng) word n-grams, one row per n-gram occurrence
    position (duplicates preserved — distinct() downstream if set
    semantics are wanted). JVM-only; documents with fewer than ``n``
    tokens yield no rows.

    The tokenization (regex whitespace normalization + split) is
    materialized ONCE per row through a projection boundary before
    the per-position transform — inlining it into the lambda makes
    Catalyst re-evaluate the regex for every window position, a
    measured 5x slowdown at 50-token docs that scales with doc
    length."""
    toks = F.split(norm_ws(text_col), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    tk = F.col("__toks")
    ks = F.when(
        F.size(tk) >= n, F.sequence(F.lit(1), F.size(tk) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    ngs = F.transform(ks, lambda k: F.array_join(F.slice(tk, k, n), " "))
    return base.select("id", F.explode(ngs).alias("ng"))


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 7,
) -> DataFrame:
    """(id, n_hits): for every corpus document sharing >= 1 word
    n-gram with the benchmark set, the count of its DISTINCT
    contaminated n-grams. Benchmark n-grams are hashed + broadcast;
    corpus n-grams are probed map-side and never shuffled — the only
    shuffled rows are actual matches.

    Hash matching (xxhash64) keeps the broadcast table 8 bytes/row;
    a false hit needs a 64-bit collision between a corpus n-gram and
    a bench n-gram (~|corpus|*|bench|/2^64 — harmless for flagging;
    pass the strings instead if exactness matters more than the
    broadcast size)."""
    bg = F.broadcast(
        word_ngrams(bench, text_col, id_col, n)
        .select(F.xxhash64("ng").alias("h"))
        .distinct()
    )
    cg = word_ngrams(corpus, text_col, id_col, n).select(
        "id", F.xxhash64("ng").alias("h")
    )
    return (
        cg.join(bg, "h", "left_semi")
        .groupBy("id")
        .agg(F.count_distinct("h").alias("n_hits"))
    )


def duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, n: int = 7
) -> DataFrame:
    """Cross-corpus duplicated-span detection — the fixed-length
    distributed approximation of exact substring dedup (public
    methodology: Lee et al. 2022, 'Deduplicating Training Data Makes
    Language Models Better', which uses a suffix array to find
    repeated spans >= 50 tokens): here a span (word n-gram window
    position) is duplicated iff its n-gram occurs at >= 2 positions
    anywhere in the corpus, itself included.

    Plan: n-grams stay JVM-side and are reduced to 8-byte xxhash64
    keys; ONE groupBy-count with map-side combine finds hashes with
    multiplicity >= 2; a shuffle semi-join flags the positions (the
    dup set is unbounded, so no broadcast assumption). Returns
    (id, n_spans, n_dup_spans); docs shorter than n tokens emit no
    row. A suffix array finds variable-length spans; at fixed n this
    is the shuffle-light equivalent a Spark cluster runs well."""
    ng = word_ngrams(df, text_col, id_col, n).select(
        "id", F.xxhash64("ng").alias("h")
    )
    dup = (
        ng.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("h")
    )
    flagged = ng.join(dup, "h", "left_semi")
    spans = ng.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    dups = flagged.groupBy("id").agg(F.count(F.lit(1)).alias("n_dup_spans"))
    return (
        spans.join(dups, "id", "left")
        .na.fill({"n_dup_spans": 0})
        .select("id", "n_spans", "n_dup_spans")
    )


def word_ngrams_pos(
    df: DataFrame, text_col: str, id_col: str, n: int = 7,
    extra_cols: tuple = (),
) -> DataFrame:
    """Positional word n-grams: (id, extra_cols..., pos, ng) with pos
    the 1-based token index of the window start. Same JVM-only column
    algebra (and the same whitespace normalization) as word_ngrams —
    the positional variant exists so runs of adjacent duplicated
    windows can be merged into maximal spans. Tokens are materialized
    once per row (see word_ngrams) before the per-position
    transform."""
    toks = F.split(norm_ws(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        toks.alias("__toks"),
    )
    tk = F.col("__toks")
    ks = F.when(
        F.size(tk) >= n, F.sequence(F.lit(1), F.size(tk) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    ngs = F.transform(ks, lambda k: F.array_join(F.slice(tk, k, n), " "))
    out = base.select(
        "id",
        *extra_cols,
        F.posexplode(ngs).alias("pos0", "ng"),
    )
    return out.select(
        "id", *extra_cols, (F.col("pos0") + 1).alias("pos"), "ng"
    )


def duplicate_maximal_spans_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 20,
    extra_cols: tuple = (),
) -> DataFrame:
    """EXACT variable-length duplicated-span dedup — the precise
    semantics of suffix-array substring dedup (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better' §3:
    remove every substring of >= K tokens that occurs >= 2 times in
    the corpus, overlapping same-document occurrences included),
    WITHOUT building a suffix array.

    The identity that makes it distributed-friendly: the union of all
    duplicated substrings of length >= K equals the union of the
    [p, p+K) windows of all duplicated EXACT K-grams —
    * any duplicated substring of length L >= K is covered by its own
      L-K+1 K-windows, each of which occurs wherever the substring
      occurs (so each is itself duplicated), and
    * every duplicated K-window is itself a qualifying duplicated
      substring.
    So one K-gram multiplicity pass + a per-document interval union
    reproduces the suffix-array answer EXACTLY — including substrings
    with internal period < K (a once-written periodic run is
    duplicated through its overlapping self-occurrences, which a
    K-gram occurs-twice count sees just as a suffix array does).

    Contrast with ``duplicate_maximal_spans`` (the fixed-small-n
    run-chaining APPROXIMATION): chaining adjacent duplicated
    n-windows with *different* partners can assemble a reported span
    that contains no duplicated >= min_tokens substring at all. The
    approximation is one-sided — a strict superset of this exact
    answer (every true span's n-windows are duplicated, so its run
    always survives chaining) — which is the recall-friendly choice
    for removal pipelines; this operator is the precision side.
    ``tests/test_contamination_exact.py`` plants the divergence.

    Plan shape at 10^12 docs: identical to the approximation and
    strictly cheaper than a distributed suffix array — K-grams hash
    to 8-byte xxhash64 keys JVM-side (never shuffling the K-token
    strings), ONE hash groupBy with map-side combine finds
    multiplicity >= 2, one shuffle semi-join flags positions, and the
    interval union (break when pos - lag(pos) > K) runs in a
    per-document window bounded by document length. Hash collisions
    can only over-merge two K-grams (2^-64-scale false spans), the
    same documented trade as every hashed-key operator here.

    Returns (id, extra_cols..., span_start, span_tokens): one row per
    maximal duplicated region; every region is >= min_tokens tokens
    by construction.
    """
    k = min_tokens
    ng = word_ngrams_pos(df, text_col, id_col, k, extra_cols).select(
        "id", *extra_cols, "pos", F.xxhash64("ng").alias("h")
    )
    dup = (
        ng.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("h")
    )
    flagged = ng.join(dup, "h", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    isl = flagged.withColumn("grp", F.sum(brk).over(w))
    return (
        isl.groupBy("id", *extra_cols, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k) - F.min("pos")).alias("span_tokens"),
        )
        .select("id", *extra_cols, "span_start", "span_tokens")
    )


def duplicate_maximal_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 7,
    min_tokens: int = 50,
    extra_cols: tuple = (),
) -> DataFrame:
    """Variable-length duplicated spans — the distributed
    approximation of suffix-array substring dedup (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better', spans
    >= 50 tokens): a MAXIMAL duplicated span is a maximal run of
    adjacent window positions whose word n-gram occurs >= 2 times
    anywhere in the corpus (itself included). A substring of length
    L >= n duplicated verbatim makes all its L-n+1 windows duplicated,
    so the run reconstructs the full span; conversely every reported
    span is a union of genuinely duplicated windows — the
    approximation only errs by chaining through coincidental window
    overlaps, shrinking as n grows.

    Plan shape at 10^12 docs: n-grams stay JVM-side as 8-byte
    xxhash64 keys; ONE (hash) groupBy with map-side combine finds
    multiplicity >= 2; a shuffle semi-join flags positions (dup set
    unbounded — no broadcast assumption); the gaps-and-islands merge
    (grp = pos - row_number) runs in a PER-DOCUMENT window, so
    partition size is bounded by document length, never corpus size.

    Returns (id, extra_cols..., span_start, span_tokens) — one row per
    maximal duplicated span covering >= min_tokens tokens; span_start
    is the 1-based token index, span_tokens the covered token count
    (run_len + n - 1).
    """
    ng = word_ngrams_pos(df, text_col, id_col, n, extra_cols).select(
        "id", *extra_cols, "pos", F.xxhash64("ng").alias("h")
    )
    dup = (
        ng.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("h")
    )
    flagged = ng.join(dup, "h", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    runs = flagged.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = (
        runs.groupBy("id", *extra_cols, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .withColumn(
            "span_tokens", F.col("span_end") - F.col("span_start") + F.lit(1)
        )
    )
    return spans.where(F.col("span_tokens") >= min_tokens).select(
        "id", *extra_cols, "span_start", "span_tokens"
    )
