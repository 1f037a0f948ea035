"""Weighted MinHash / ICWS (sketches/wminhash.py, operators/
weighted_minhash.py): collision probability tracks weighted Jaccard,
signatures are pure functions of the count vector, the exact verifier
matches a local oracle, and the end-to-end pipeline is frequency-
sensitive where set-MinHash is blind."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.weighted_minhash import (
    weighted_jaccard_pairs,
    wminhash_near_dups,
    wminhash_signatures,
)
from q_digest_spark.sketches.wminhash import (
    exact_weighted_jaccard,
    icws_signature,
    token_counts,
    wminhash_batch,
)

U64 = np.uint64


def _vec(rng, n=50):
    h = rng.integers(0, 2**63, n).astype(U64)
    w = rng.integers(1, 12, n).astype(np.float64)
    return h, w


def test_icws_deterministic_and_order_invariant():
    rng = np.random.default_rng(3)
    h, w = _vec(rng)
    s1 = icws_signature(h, w, 64)
    perm = rng.permutation(len(h))
    s2 = icws_signature(h[perm], w[perm], 64)
    assert (s1 == s2).all()


def test_icws_collision_rate_tracks_weighted_jaccard():
    rng = np.random.default_rng(11)
    h, wa = _vec(rng, 60)
    for mutate in (0.0, 0.3, 1.0):
        wb = wa.copy()
        k = int(len(wa) * mutate)
        if k:
            wb[:k] = rng.integers(1, 12, k).astype(np.float64)
        jw = np.minimum(wa, wb).sum() / np.maximum(wa, wb).sum()
        est = (icws_signature(h, wa, 4096) == icws_signature(h, wb, 4096)).mean()
        # 4096 perms: std <= 0.5/64; allow 5 sigma
        assert abs(est - jw) < 0.04, (mutate, jw, est)


def test_icws_scaled_weights_half_similarity():
    rng = np.random.default_rng(5)
    h, w = _vec(rng, 40)
    est = (icws_signature(h, w, 4096) == icws_signature(h, 2 * w, 4096)).mean()
    assert abs(est - 0.5) < 0.04


def test_icws_empty_doc_sentinel():
    e = np.empty(0, dtype=U64)
    ew = np.empty(0, dtype=np.float64)
    s1 = icws_signature(e, ew, 32)
    s2 = icws_signature(e, ew, 32)
    assert (s1 == s2).all()
    h, w = _vec(np.random.default_rng(1), 5)
    assert not (icws_signature(h, w, 32) == s1).all()


def test_exact_weighted_jaccard_local():
    assert exact_weighted_jaccard("a a b", "a b b") == pytest.approx(0.5)
    assert exact_weighted_jaccard("a b", "a b") == 1.0
    t = "x y z x"
    assert exact_weighted_jaccard(t, t + " " + t) == pytest.approx(0.5)
    assert exact_weighted_jaccard("", "") == 1.0
    assert exact_weighted_jaccard("a", "b") == 0.0


def test_token_counts_case_and_whitespace():
    h1, w1 = token_counts("The  cat\nthe CAT")
    # 'the' x2 + 'cat' x2 after lowering, across mixed whitespace
    assert sorted(w1.tolist()) == [2.0, 2.0]
    h2, w2 = token_counts("the cat the cat")
    assert set(h1.tolist()) == set(h2.tolist())


def test_batch_identical_rows_equal():
    t = "the cat sat on the mat"
    sig = wminhash_batch(pd.Series([t, t, t + " extra"]), 64)
    assert (sig[0] == sig[1]).all()
    assert not (sig[0] == sig[2]).all()


def test_weighted_jaccard_pairs_matches_local(spark):
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b c"), (3, "a a b c"), (4, "z z z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jw_ppt"]
        for r in weighted_jaccard_pairs(
            docs, pairs, "text", "doc_id", threshold_ppt=0
        ).collect()
    }
    # (1,2): min 1+1+1=3? a:min(2,1)=1 b:min(1,2)=1 c:1 -> 3 / max 2+2+1=5
    assert got[(1, 2)] == 600
    assert got[(1, 3)] == 1000
    # disjoint pair: smin = 0 -> jw 0, kept at threshold 0
    assert got[(1, 4)] == 0


def test_weighted_jaccard_pairs_threshold_integer_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    # J_w = 3/5 exactly: kept at 600, dropped at 601
    assert weighted_jaccard_pairs(docs, pairs, "text", "doc_id", 600).count() == 1
    assert weighted_jaccard_pairs(docs, pairs, "text", "doc_id", 601).count() == 0


def test_near_dups_end_to_end_frequency_sensitive(spark):
    base = [(i, f"tok{i} alpha beta gamma delta tok{i}") for i in range(20)]
    rows = (
        base
        + [(i + 100, t) for i, t in base]                   # identical: J_w 1
        + [(i + 200, t + " " + t) for i, t in base]          # doubled: J_w 0.5
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jw_ppt"]
        for r in wminhash_near_dups(
            docs, "text", "doc_id", threshold_ppt=900
        ).collect()
    }
    for i in range(20):
        assert got.get((i, i + 100)) == 1000, i  # deterministic recall
    assert all(not (a >= 200 or b >= 200) for a, b in got), got


def test_signatures_schema_and_width(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    rows = wminhash_signatures(docs, "text", "doc_id", n_perm=32).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(len(r["sig"]) == 32 for r in rows)


def test_batch_segmented_matches_single_doc_path():
    """The chunk-packed segmented kernel must be bit-identical to the
    per-doc icws_signature reference for every doc, including chunk
    boundaries, empty docs, and single docs larger than the chunk."""
    import numpy as np
    import pandas as pd

    from q_digest_spark.sketches.wminhash import (
        icws_signature,
        token_counts,
        wminhash_batch,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 60))
        texts.append(" ".join(rng.choice(vocab, size=n)) if n else "")
    texts.append(None)
    texts.append(" ".join(rng.choice(vocab, size=500)))  # > chunk alone
    got = wminhash_batch(pd.Series(texts), n_perm=16, chunk_tokens=64)
    for i, t in enumerate(texts):
        h, w = token_counts(t if isinstance(t, str) else None)
        ref = icws_signature(h, w, n_perm=16)
        assert (got[i] == ref).all(), i
