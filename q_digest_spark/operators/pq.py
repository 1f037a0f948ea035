"""Product quantization (PQ) for embedding compression + ANN.

The public Jégou/Douze/Schmid construction ("Product quantization
for nearest neighbor search", TPAMI 2011): split the d-dim vector
into ``m`` subvectors, k-means each subspace to ``ksub`` codewords,
store each vector as m small codes (here 1 byte each → a 64-dim
float32 embedding compresses 256 B → m B). Queries score compressed
rows via ADC (asymmetric distance computation): per-subspace lookup
tables of q_sub · codeword, summed by code — no decompression.

Scale shape (the reason PQ matters at 100 TB): the ADC scan reads
ONLY the (id, code) table — a 16-32x smaller scan than raw vectors —
and each partition emits just its local shortlist
(O(partitions * q * shortlist)); the optional exact re-rank joins
raw vectors for the shortlist rows alone. Codebooks train on a
bounded hash-sample (same contract as similarity.ivf_train_centroids:
~50k rows collected regardless of table size) and broadcast into UDF
closures (m * ksub * dsub floats — KBs).

No reference counterpart (qcore.c has no vector layer).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .similarity import _normalize, _stack_vec, bounded_vec_sample


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 16,
    ksub: int = 16,
    sample_mod: int | None = None,
    iters: int = 12,
    seed: int = 11,
    target_sample: int = 50_000,
) -> np.ndarray:
    """(m, ksub, dsub) codebooks: deterministic per-subspace k-means
    (k-means++ init, fixed seed) over a hash-sampled, L2-normalized
    subset; the collect is bounded by ``target_sample`` regardless of
    table size. Requires dim % m == 0."""
    sample = bounded_vec_sample(df, vec_col, target_sample, sample_mod)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    ksub_eff = min(ksub, len(sample))
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub_eff, dsub))
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cents = [sub[rng.randint(len(sub))]]
        # k-means++ with an incrementally maintained min-distance
        # vector: only the NEWEST centroid's distances are computed
        # per step (O(k n d), not O(k^2 n d)); the d2 values — and
        # therefore the rng draws — are identical to the naive form
        d2 = ((sub - cents[0]) ** 2).sum(axis=1)
        for _ in range(ksub_eff - 1):
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            nxt = sub[rng.choice(len(sub), p=probs)]
            cents.append(nxt)
            d2 = np.minimum(d2, ((sub - nxt) ** 2).sum(axis=1))
        cents = np.stack(cents)
        for _ in range(iters):
            # argmin ||x-c||^2 == argmin(-2 x.c + ||c||^2): one matmul
            # instead of materializing the (n, ksub, dsub) difference
            scores = -2.0 * (sub @ cents.T) + (cents**2).sum(axis=1)[None, :]
            assign = scores.argmin(axis=1)
            # centroid update via bincount sums (no per-cluster scan)
            counts = np.bincount(assign, minlength=ksub_eff).astype(np.float64)
            sums = np.zeros((ksub_eff, dsub))
            for dd in range(dsub):
                sums[:, dd] = np.bincount(
                    assign, weights=sub[:, dd], minlength=ksub_eff
                )
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz, None]
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(vid, code binary) — m bytes per vector (nearest codeword per
    subspace over the L2-normalized vector). Arrow-batched numpy; the
    codebooks ride the closure (broadcast semantics)."""
    m, ksub, dsub = codebooks.shape
    books = codebooks  # closure capture

    def enc(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _normalize(_stack_vec(pdf["vec"]))
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub**2).sum(axis=1, keepdims=True)
                    - 2 * sub @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy(dtype=np.int64),
                    "code": [c.tobytes() for c in codes],
                }
            )

    sdf = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    return sdf.mapInPandas(enc, "vid long, code binary")


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: dict[int, np.ndarray],
    k: int = 5,
    raw: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist_mult: int = 4,
) -> DataFrame:
    """ANN over the compressed table: (query_id, rank, neighbor_id,
    sim). ADC lookup-table scoring per partition emits a local
    shortlist of ``k * shortlist_mult`` per query; when ``raw`` is
    given the global shortlist is exact-cosine re-ranked against the
    raw vectors (a tiny equi-join — q * shortlist rows), the
    production PQ + re-rank shape. Same rounding/tie rules as
    similarity.brute_force_topk."""
    m, ksub, dsub = codebooks.shape
    books = codebooks
    qids = np.array(sorted(queries), dtype=np.int64)
    qmat = _normalize(
        np.stack([np.asarray(queries[int(q)], dtype=np.float64) for q in qids])
    )
    # ADC tables: tables[q, j, c] = q_sub_j . codeword_c
    tables = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids), m, dsub), books)
    shortlist = k * shortlist_mult

    def adc(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8).reshape(
                len(pdf), m
            )
            ids = pdf["vid"].to_numpy(dtype=np.int64)
            out_q, out_id, out_sim = [], [], []
            for qi, q in enumerate(qids):
                # sim[i] = sum_j tables[qi, j, c[i, j]]
                sims = tables[qi][np.arange(m)[None, :], c].sum(axis=1)
                mask = ids != q
                cid, csim = ids[mask], sims[mask]
                take = min(shortlist, len(cid))
                if take == 0:
                    continue
                top = np.argpartition(-csim, take - 1)[:take]
                out_q.append(np.full(take, q))
                out_id.append(cid[top])
                out_sim.append(csim[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_id),
                        "sim": np.concatenate(out_sim),
                    }
                )

    partial = codes.mapInPandas(adc, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    short = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist)
        .drop("rank")
    )
    if raw is None:
        ranked = short.withColumn("sim", F.round("sim", 6)).withColumn(
            "rank", F.row_number().over(w)
        )
        return ranked.where(F.col("rank") <= k).select(
            "query_id", "rank", "neighbor_id", "sim"
        )

    # exact re-rank of the shortlist against raw vectors
    rv = raw.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    qmap = {int(q): qmat[i] for i, q in enumerate(qids)}

    def exact(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(_stack_vec(pdf["vec"]))
            qm = np.stack([qmap[int(q)] for q in pdf["query_id"]])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "sim": (v * qm).sum(axis=1),
                }
            )

    joined = short.select("query_id", "neighbor_id").join(rv, "neighbor_id")
    rer = joined.mapInPandas(exact, "query_id long, neighbor_id long, sim double")
    ranked = rer.withColumn("sim", F.round("sim", 6)).withColumn(
        "rank", F.row_number().over(w)
    )
    return ranked.where(F.col("rank") <= k).select(
        "query_id", "rank", "neighbor_id", "sim"
    )
