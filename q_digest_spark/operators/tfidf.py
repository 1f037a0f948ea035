"""Corpus TF-IDF: document-frequency statistics and per-document top
terms, entirely in JVM column algebra (split/explode/groupBy — no
Python in the path).

Plan shape at corpus scale: one shuffle keyed (doc, term) for term
frequencies, one keyed (term) for document frequencies, one
shuffle join tf⋈df on term (vocabulary is Zipf-heavy but AQE's
skew-join handles the head terms), and a WindowGroupLimit top-k per
doc (per-partition per-group heaps before the final shuffle). The
scalar corpus size N is the only driver value (a count()).

The IDF is the standard smoothed form ln((N+1)/(df+1)) + 1 (public:
the sklearn TfidfTransformer formula). Scores are QUANTIZED to 1e-6
(bigint) with term-name tie-breaks so rankings survive last-ulp libm
differences across engines — same contract as
operators/sampling.weighted_sample.

No reference counterpart (qcore.c has no text layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import norm_ws


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — canonical whitespace/lower normalization
    shared with the DuckDB oracles; empty terms dropped."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(norm_ws(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) from a term_frequencies table — rows there are
    already distinct per (id, term), so df is a plain count."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, term, tf, score_q) — the k highest-TF-IDF terms per
    document (quantized score, ties by term asc). ``score_q`` =
    round(tf * (ln((N+1)/(df+1)) + 1) * 1e6)."""
    tf = term_frequencies(df, text_col, id_col)
    dfc = document_frequencies(tf)
    n = df.count()
    scored = tf.join(dfc, "term").withColumn(
        "score_q",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n + 1))) / (F.col("df") + F.lit(1)).cast("double")) + F.lit(1.0))
            * F.lit(1e6)
        ).cast("bigint"),
    )
    w = Window.partitionBy("id").orderBy(F.col("score_q").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("id", "term", "tf", "score_q")
    )


def rare_token_stats(
    df: DataFrame, text_col: str, id_col: str, min_df: int = 2
) -> DataFrame:
    """Per-document rare-token (OOV-against-own-corpus) statistics —
    the corpus-frequency quality signal LLM pipelines use to catch
    gibberish/encoding-noise docs: a token occurrence is *rare* iff
    its corpus document frequency is below ``min_df``.

    Scale shape: DF is one token-keyed shuffle with map-side combine;
    only the HEAD vocabulary (df >= min_df — the small, Zipf-head
    side) is broadcast back, so the unbounded singleton tail never
    sits in a join hash table; rareness is a broadcast left-join null
    check. Returns (id, n_tokens, n_rare), exact integers."""
    tf = term_frequencies(df, text_col, id_col)
    head = (
        document_frequencies(tf)
        .where(F.col("df") >= min_df)
        .select("term", F.lit(1).alias("__known"))
    )
    return (
        tf.join(F.broadcast(head), "term", "left")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.when(F.col("__known").isNull(), F.col("tf")).otherwise(F.lit(0))
            ).alias("n_rare"),
        )
    )


def token_freq_octaves(df: DataFrame, text_col: str) -> DataFrame:
    """Zipf doubling histogram: bucket the corpus vocabulary by the
    OCTAVE of each token's total occurrence count (octave =
    floor(log2(count))) and report, per octave, the number of
    distinct tokens and their summed occurrences.

    The classic Zipf / power-law diagnostic for a training corpus —
    on Zipfian text the per-octave token count decays geometrically
    while per-octave mass stays near-flat — computed entirely with
    INTEGER arithmetic: the octave is the bit length of the count
    (length of its base-2 string, all-JVM conv/length codegen), never
    floor(log2(x)) in floating point, so a count of 2^k - 1 can't
    misround across engines (a SQL oracle reproduces it with an
    integer-compare-corrected log2 or a printf('%b') length).

    100-TB shape: one (term) shuffle with map-side combine builds the
    counts; the octave rollup is a second shuffle over <= 64 groups.
    """
    toks = (
        df.select(F.explode(F.split(norm_ws(text_col), " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    octave = (F.length(F.conv(F.col("c").cast("string"), 10, 2)) - 1).cast("long")
    return (
        toks.select(octave.alias("octave"), "c")
        .groupBy("octave")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("occurrences"),
        )
    )


def host_template_tokens(
    df: DataFrame,
    host_col: str,
    id_col: str,
    text_col: str,
    min_ppm: int = 800_000,
) -> DataFrame:
    """Per-host template vocabulary — tokens appearing in at least
    ``min_ppm`` / 1e6 of a host's documents. The host-keyed analogue
    of CCNet line dedup: terms this ubiquitous within one site are
    navigation/boilerplate, not content, and belong on a per-host
    stopword list before quality scoring or near-dup hashing.

    Integer-exact membership test (df_host * 1e6 >= min_ppm * n_docs),
    so any SQL engine reproduces the token list bit-for-bit.

    100-TB shape: distinct (host, doc, term) triples shuffle once to
    (host, term) with map-side combine; per-host doc counts broadcast
    (O(#hosts) rows). No corpus-global vocabulary is materialized
    anywhere — every aggregate is host-scoped.
    """
    base = df.where(
        F.col(host_col).isNotNull() & F.col(text_col).isNotNull()
    )
    dt = (
        base.select(
            F.col(host_col).alias("source"),
            F.col(id_col).alias("id"),
            F.explode(F.split(norm_ws(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    hdf = dt.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("df_host")
    )
    hn = base.groupBy(F.col(host_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        hdf.join(F.broadcast(hn), "source")
        .where(
            F.col("df_host") * F.lit(1_000_000)
            >= F.lit(min_ppm) * F.col("n_docs")
        )
        .select(
            "source",
            "term",
            "df_host",
            "n_docs",
            F.expr("CAST(df_host * 1000000 div n_docs AS BIGINT)").alias(
                "ppm"
            ),
        )
    )
