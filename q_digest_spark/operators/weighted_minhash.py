"""Weighted-Jaccard near-duplicate detection: ICWS weighted MinHash
signatures (sketches/wminhash.py), LSH banding for candidates, exact
weighted-Jaccard verification in pure DataFrame algebra.

Pipeline (mirrors operators/dedup.minhash_near_dups, but frequency-
sensitive):
  1. signatures — one mapInPandas pass; only (doc_id, n_perm*8B)
     leaves the worker, never tokens.
  2. candidates — banded signatures self-join per bucket
     (dedup.lsh_candidate_pairs, including cap_buckets for
     pathological boilerplate buckets).
  3. verify — EXACT weighted Jaccard, integer-thresholded: J_w >=
     tau/1000 is evaluated as 1000*sum_min >= tau*sum_max in int64,
     so the accept/reject decision is bit-reproducible in any SQL
     engine (no float division at the boundary).

Verification cost is bounded by the candidate set: token counts are
materialized only for docs appearing in candidate pairs (semi-join
pushdown), and the per-pair union of tokens is two narrow joins on
(pair, token) — never an all-pairs product.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches.wminhash import wminhash_batch


def wminhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_perm: int = 64
) -> DataFrame:
    """(doc_id, sig array<long>) — ICWS signatures over lowercase
    whitespace token counts."""
    sdf = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def compute(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            sig = wminhash_batch(pdf["text"], n_perm)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "sig": list(sig.view(np.int64)),
                }
            )

    return sdf.mapInPandas(compute, "doc_id long, sig array<long>")


def _token_count_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, tok, c): lowercase whitespace token counts, all JVM —
    must tokenize identically to sketches.wminhash.token_counts
    (str.lower().split() == split on \\s+ runs, empties dropped)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    threshold_ppt: int = 800,
) -> DataFrame:
    """Exact weighted Jaccard for candidate (id_a, id_b) pairs:
    returns (id_a, id_b, jw_ppt) for pairs with J_w >= threshold_ppt
    per mille. jw_ppt = (1000 * sum_min) div sum_max — floor of the
    true value in thousandths, integer-exact."""
    ids = (
        pairs.select(F.col("id_a").alias("__pid"))
        .unionByName(pairs.select(F.col("id_b").alias("__pid")))
        .distinct()
    )
    toks = _token_count_df(
        docs.join(ids, F.col(id_col) == F.col("__pid"), "left_semi"),
        text_col,
        id_col,
    )
    # both verify sides consume toks; spill once so the candidate
    # semi-join + tokenize + count upstream runs once, not twice
    from ._spill import spill_parquet

    toks = spill_parquet(toks, "qds_wjacc_toks_")
    ta = toks.select(
        F.col("doc_id").alias("id_a"), "tok", F.col("c").alias("ca")
    )
    tb = toks.select(
        F.col("doc_id").alias("id_b"), "tok", F.col("c").alias("cb")
    )
    pa = pairs.join(ta, "id_a").select("id_a", "id_b", "tok", "ca")
    pb = pairs.join(tb, "id_b").select("id_a", "id_b", "tok", "cb")
    u = pa.join(pb, ["id_a", "id_b", "tok"], "full_outer").select(
        "id_a",
        "id_b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    agg = u.groupBy("id_a", "id_b").agg(
        F.sum(F.least("ca", "cb")).cast("bigint").alias("smin"),
        F.sum(F.greatest("ca", "cb")).cast("bigint").alias("smax"),
    )
    return (
        agg.where(F.lit(1000) * F.col("smin") >= F.lit(threshold_ppt) * F.col("smax"))
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(1000 * smin div smax AS BIGINT)").alias("jw_ppt"),
        )
    )


def wminhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_ppt: int = 800,
    n_perm: int = 64,
    bands: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end: (id_a, id_b, jw_ppt) with exact weighted Jaccard
    >= threshold_ppt/1000, candidates from ICWS + LSH banding.
    Recall is probabilistic for near (not exact) duplicates — sized
    by bands/n_perm via the usual 1-(1-s^w)^b S-curve with s = J_w —
    and exactly 1.0 for identical documents (identical signatures
    share every band)."""
    from .dedup import lsh_candidate_pairs, optimal_bands

    slots = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < slots:
        df = df.repartition(slots)
    sig = wminhash_signatures(df, text_col, id_col, n_perm).persist()
    b = bands if bands is not None else optimal_bands(n_perm, threshold_ppt / 1000.0)
    cand = lsh_candidate_pairs(sig, bands=b, max_bucket=max_bucket)

    # Signature-agreement prefilter (same layer as minhash_near_dups):
    # on a shared-vocabulary corpus the banding alone lets through a
    # flood of ~mid-similarity pairs; the per-mille sketch estimate
    # (matching perms / n_perm) at threshold - 0.2 kills them before
    # the exact token-join verifier. Identical docs estimate 1.0 and
    # are never dropped, so exact-duplicate recall stays a theorem;
    # a true J_w >= 0.9 pair under-estimating below 0.7 needs a >5
    # sigma binomial deviation at n_perm = 64.
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    with_sigs = cand.join(sa, "id_a").join(sb, "id_b")
    cut = max(0.0, threshold_ppt / 1000.0 - 0.2)

    def prefilter(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf["sig_a"].to_numpy())
            b_ = np.stack(pdf["sig_b"].to_numpy())
            keep = (a == b_).mean(axis=1) >= cut
            if keep.any():
                yield pdf.loc[keep, ["id_a", "id_b"]]

    pref = with_sigs.mapInPandas(prefilter, "id_a long, id_b long")
    # Spill the (small) surviving pairs and drop the signature cache —
    # signatures are computed once, survivors outlive executor loss
    # (the 100 TB shape; see minhash_near_dups for the full rationale).
    from ._spill import spill_parquet

    survivors = spill_parquet(pref, "qds_wminhash_cands_")
    sig.unpersist()
    return weighted_jaccard_pairs(df, survivors, text_col, id_col, threshold_ppt)
