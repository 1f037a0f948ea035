"""Product quantization (operators/pq.py): codebook determinism,
encode round-trip quality, ADC recall vs brute force, re-rank path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from q_digest_spark.operators.pq import pq_encode, pq_topk, pq_train_codebooks
from q_digest_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_test):
    return spark.read.parquet(f"{sf_test}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train_codebooks(emb, "embedding", m=16, ksub=16)


def test_codebooks_shape_and_deterministic(emb, books):
    assert books.shape == (16, 16, 4)
    again = pq_train_codebooks(emb, "embedding", m=16, ksub=16)
    assert np.array_equal(books, again)


def test_encode_compression_and_quantization_error(spark, emb, books):
    codes = pq_encode(emb, "vec_id", "embedding", books)
    rows = codes.collect()
    assert all(len(r["code"]) == 16 for r in rows)
    assert len(rows) == emb.count()
    # reconstruction correlates with the original: mean cosine between
    # the decoded approximation and the true vector is high
    raw = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    sims = []
    for r in rows:
        c = np.frombuffer(r["code"], dtype=np.uint8)
        dec = np.concatenate([books[j, c[j]] for j in range(16)])
        v = raw[r["vid"]]
        v = v / np.linalg.norm(v)
        sims.append(float(dec @ v / max(np.linalg.norm(dec), 1e-12)))
    assert np.mean(sims) > 0.8, np.mean(sims)


def _queries(emb, n=3):
    rows = emb.where(F.col("vec_id") < n).collect()
    return {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in rows}


def test_pq_topk_recall_vs_brute_force(spark, emb, books):
    qs = _queries(emb)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    bf = brute_force_topk(emb, "vec_id", "embedding", qs, k=5)
    adc = pq_topk(codes, books, qs, k=5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in adc.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_pq_rerank_matches_brute_force_sims(spark, emb, books):
    """With exact re-rank, every returned sim equals the true cosine
    (same rounding as brute_force_topk), and recall improves to ~1 on
    this fixture."""
    qs = _queries(emb)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    rer = pq_topk(codes, books, qs, k=5, raw=emb, shortlist_mult=8)
    bf = brute_force_topk(emb, "vec_id", "embedding", qs, k=5)
    bf_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in bf.collect()}
    hit = 0
    for r in rer.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_sims:
            hit += 1
            assert abs(r["sim"] - bf_sims[key]) < 1e-9, (key, r["sim"], bf_sims[key])
    assert hit / len(bf_sims) >= 0.8, hit / len(bf_sims)
