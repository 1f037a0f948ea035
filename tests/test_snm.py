"""Sorted-neighborhood dedup (operators/dedup.sorted_neighborhood_pairs).

The load-bearing property is the DISTRIBUTED global rank: bucket
offsets + per-bucket windows must reproduce the single-ordering
row_number exactly, or the window semantics silently shift. Plus:
planted adjacent duplicates are found, non-duplicate prefix-collisions
are rejected by the verify stage, and the window bound is respected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from q_digest_spark.operators.dedup import sorted_neighborhood_pairs


def _corpus(spark):
    rows = []
    # 20 distinct docs, ids 0..19; copies at id+100 (exact dups)
    for i in range(20):
        rows.append((i, f"shared prefix words {i:02d} tail content alpha beta"))
        rows.append((i + 100, f"shared  PREFIX words {i:02d}  tail content alpha beta"))
    # prefix collision, different content: candidate but not verified
    rows.append((555, "shared prefix words 00 tail content alpha DIFFERENT"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rank_matches_single_ordering(spark):
    df = _corpus(spark)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    keyed = df.select(
        "doc_id", F.substring(norm, 1, 40).alias("key")
    )
    truth = {
        r["doc_id"]: i + 1
        for i, r in enumerate(keyed.orderBy("key", "doc_id").collect())
    }
    # reproduce the operator's internal rank by running it with
    # window=len so every pair within any gap is attempted, then
    # checking gap values against the truth ranks for verified pairs
    pairs = sorted_neighborhood_pairs(df, "text", "doc_id", window=45).collect()
    for p in pairs:
        assert abs(truth[p["doc_b"]] - truth[p["doc_a"]]) == p["rank_gap"]


def test_planted_dups_found_and_verified(spark):
    df = _corpus(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs(df, "text", "doc_id", window=4).collect()
    }
    # normalization makes (i, i+100) exact dups; keys are equal so they
    # sort adjacent (same 40-char key, id tie-break, with only the
    # collision doc between some) -> all 20 pairs within window 4
    for i in range(20):
        assert (i, i + 100) in pairs
    # the prefix-collision doc is never verified (different content)
    assert not any(555 in p for p in pairs)


def test_window_bound_respected(spark):
    # identical keys, distinct contents except one far-apart dup:
    # ids 0..9 share the sort key; contents differ except 0 and 9,
    # which are rank gap 9 apart -> invisible at window 4
    rows = [(i, f"identical key prefix padding padding pad {i}") for i in range(1, 9)]
    rows += [(0, "identical key prefix padding padding pad X"),
             (9, "identical key  prefix padding padding pad X")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    near = sorted_neighborhood_pairs(df, "text", "doc_id", window=4).collect()
    assert near == []
    far = sorted_neighborhood_pairs(df, "text", "doc_id", window=9).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in far] == [(0, 9)]
