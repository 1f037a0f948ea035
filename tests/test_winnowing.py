"""Winnowing (MOSS) fingerprints: locality guarantee, density,
planted-dup recall, and edge cases."""

import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.winnowing import (
    winnow_dup_pairs,
    winnow_fingerprints,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_yields_no_fingerprints(spark):
    # < k + w - 1 = 8 tokens -> no complete window -> no rows
    df = _mk(spark, [(1, "a b c d e f g")])  # 7 tokens, 3 grams < w
    assert winnow_fingerprints(df, "text", "doc_id", k=5, w=4).count() == 0


def test_exact_window_count(spark):
    # 8 tokens -> 4 grams -> exactly 1 complete window -> 1 fingerprint
    df = _mk(spark, [(1, "a b c d e f g h")])
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, w=4)
    assert fps.count() == 1


def test_locality_guarantee_shared_substring(spark):
    # two docs sharing a >= k+w-1 token substring MUST share >= 1 fp
    shared = " ".join(f"s{i}" for i in range(20))
    df = _mk(
        spark,
        [
            (1, "p1 p2 p3 " + shared),
            (2, shared + " t1 t2 t3 t4"),
        ],
    )
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, w=4)
    a = {r.fp for r in fps.where("id = 1").collect()}
    b = {r.fp for r in fps.where("id = 2").collect()}
    assert a & b, "locality guarantee violated: no shared fingerprint"


def test_density_reduction(spark):
    # selected fingerprints per doc are far fewer than n-grams
    text = " ".join(f"w{i}" for i in range(200))  # all-distinct tokens
    df = _mk(spark, [(1, text)])
    n_fps = winnow_fingerprints(df, "text", "doc_id", k=5, w=4).count()
    n_grams = 200 - 4
    assert n_fps < n_grams  # strict reduction
    # expected density 2/(w+1) = 0.4; allow generous slack
    assert n_fps < 0.7 * n_grams


def test_dup_pairs_finds_planted_copy(spark):
    base = " ".join(f"tok{i}" for i in range(50))
    other = " ".join(f"z{i}" for i in range(50))
    df = _mk(
        spark,
        [(1, base), (2, "x1 x2 x3 " + base), (3, other)],
    )
    pairs = winnow_dup_pairs(
        df, "text", "doc_id", k=5, w=4, min_shared=2, max_df=20
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_max_df_drops_boilerplate(spark):
    # the same text in many docs -> every fp exceeds max_df -> no pairs
    text = " ".join(f"b{i}" for i in range(30))
    df = _mk(spark, [(i, text) for i in range(6)])
    pairs = winnow_dup_pairs(
        df, "text", "doc_id", k=5, w=4, min_shared=1, max_df=5
    )
    assert pairs.count() == 0


def test_bad_params_raise(spark):
    df = _mk(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, "text", "doc_id", k=0, w=4)


def test_fingerprints_deterministic(spark):
    df = _mk(spark, [(1, " ".join(f"d{i}" for i in range(40)))])
    one = sorted(r.fp for r in winnow_fingerprints(df, "text", "doc_id").collect())
    two = sorted(r.fp for r in winnow_fingerprints(df, "text", "doc_id").collect())
    assert one == two and len(one) > 0
