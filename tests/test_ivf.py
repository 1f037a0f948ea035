"""IVF ANN: full-probe exactness vs brute force, partial-probe recall."""

import numpy as np
from pyspark.sql import functions as F

from q_digest_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    ivf_train_centroids,
)


def _queries(spark, sf_dir, n):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.where(F.col("vec_id") < n).collect()
    return emb, {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in rows}


def test_ivf_full_probe_equals_brute_force(spark, sf_test):
    emb, qs = _queries(spark, sf_test, 5)
    exact = brute_force_topk(emb, "vec_id", "embedding", qs, k=5).collect()
    full = ivf_topk(
        emb, "vec_id", "embedding", qs, k=5, n_clusters=8, nprobe=8
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, full)) == sorted(map(key, exact))


def test_ivf_partial_probe_recall(spark, sf_test):
    emb, qs = _queries(spark, sf_test, 8)
    exact = brute_force_topk(emb, "vec_id", "embedding", qs, k=5).collect()
    approx = ivf_topk(
        emb, "vec_id", "embedding", qs, k=5, n_clusters=8, nprobe=4
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall


def test_ivf_centroids_deterministic(spark, sf_test):
    emb = spark.read.parquet(f"{sf_test}/embeddings.parquet")
    c1 = ivf_train_centroids(emb, "embedding", n_clusters=8)
    c2 = ivf_train_centroids(emb, "embedding", n_clusters=8)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_storage_layout_prunes_scan(spark, sf_test, tmp_path):
    """write_embeddings_ivf + ivf_topk_pruned: the pruned reader must
    (a) only open files under the probed ivf_cell partitions — true
    I/O pruning, not compute-side masking — and (b) return exactly
    the compute-side ivf_topk result for the same centroids/nprobe,
    and the exact brute-force result at full probe."""
    from q_digest_spark.operators.similarity import (
        ivf_topk_pruned,
        write_embeddings_ivf,
    )

    emb, qs = _queries(spark, sf_test, 4)
    path = str(tmp_path / "emb_ivf")
    cents = write_embeddings_ivf(emb, "vec_id", "embedding", path, n_clusters=8)
    assert len(cents) == 8

    pruned = ivf_topk_pruned(spark, path, qs, k=5, nprobe=2)
    # I/O pruning: compute the probed cell set and check inputFiles
    m = np.stack([qs[q] for q in sorted(qs)]).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    probed = {int(c) for row in np.argsort(-(m @ cents.T), axis=1)[:, :2] for c in row}
    files = pruned.inputFiles()
    assert files, "pruned scan lists no files"
    for f in files:
        cell = int(f.split("ivf_cell=")[1].split("/")[0])
        assert cell in probed, f"scan reads unprobed cell {cell}"

    # same result as the compute-side ivf_topk with identical centroids
    compute = ivf_topk(
        emb, "vec_id", "embedding", qs, k=5, n_clusters=8, nprobe=2, centroids=cents
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, pruned.collect())) == sorted(map(key, compute))

    # full probe == exact brute force
    full = ivf_topk_pruned(spark, path, qs, k=5, nprobe=8).collect()
    exact = brute_force_topk(emb, "vec_id", "embedding", qs, k=5).collect()
    assert sorted(map(key, full)) == sorted(map(key, exact))


def test_ivf_training_sample_bounded(spark, sf_test):
    """Auto sample_mod bounds the driver collect regardless of table
    size: with a tiny target_sample the hash-filtered training subset
    is ~that size (never the full table), centroids stay deterministic
    (hash membership, not a random split), and full probe with the
    sampled centroids is still exact — cell assignment only affects
    which partition a row lands in, not the scored similarity."""
    emb, qs = _queries(spark, sf_test, 3)
    n = emb.count()
    target = max(16, n // 20)
    c1 = ivf_train_centroids(emb, "embedding", n_clusters=4, target_sample=target)
    c2 = ivf_train_centroids(emb, "embedding", n_clusters=4, target_sample=target)
    assert np.array_equal(c1, c2)
    # the training subset really is the bounded hash sample
    mod = max(1, n // target)
    assert mod > 1, "fixture too small to exercise sampling"
    surv = emb.where(F.pmod(F.xxhash64("embedding"), F.lit(mod)) == 0).count()
    assert 0 < surv <= 4 * target
    full = ivf_topk(
        emb, "vec_id", "embedding", qs, k=5, n_clusters=4, nprobe=4, centroids=c1
    ).collect()
    exact = brute_force_topk(emb, "vec_id", "embedding", qs, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, full)) == sorted(map(key, exact))


def test_ivf_hot_cell_split_bounds_partitions(spark, tmp_path):
    """Adversarial skew: EVERY vector lands in one cluster. With
    cap_rows set, the hot cell must split into multiple ivf_sub
    directories, each holding <= ~cap rows (hash-split, so allow 2x
    statistical slack) — bounding reducer memory and file size no
    matter how skewed the embedding distribution is. The pruned
    reader must return identical results over the split layout."""
    import os

    from q_digest_spark.operators.similarity import (
        ivf_topk_pruned,
        write_embeddings_ivf,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(8).astype(np.float64)
    base /= np.linalg.norm(base)
    # 600 near-identical vectors (one cluster) + 8 scattered ones
    rows = [
        (i, (base + 0.01 * rng.randn(8)).tolist()) for i in range(600)
    ] + [(1000 + j, rng.randn(8).tolist()) for j in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = {0: np.array(rows[0][1]), 1000: np.array(rows[600][1])}

    cap = 100
    path = str(tmp_path / "emb_hot")
    cents = write_embeddings_ivf(
        emb, "vec_id", "embedding", path, n_clusters=4, cap_rows=cap
    )

    # the hot cell exists and was split into >= 600/100 subdirs
    cell_dirs = [d for d in os.listdir(path) if d.startswith("ivf_cell=")]
    assert cell_dirs
    sub_counts = {}
    for d in cell_dirs:
        subs = [s for s in os.listdir(f"{path}/{d}") if s.startswith("ivf_sub=")]
        assert subs, f"{d} missing ivf_sub level (tree must stay uniform)"
        sub_counts[d] = len(subs)
    assert max(sub_counts.values()) >= 6, sub_counts

    # every (cell, sub) directory is bounded (2x slack for hash split)
    full = spark.read.parquet(path)
    per_dir = (
        full.groupBy("ivf_cell", "ivf_sub")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert max(r["c"] for r in per_dir) <= 2 * cap, per_dir

    # recall/results unaffected by the storage split: full probe over
    # the split layout == brute force
    from q_digest_spark.operators.similarity import brute_force_topk

    exact = brute_force_topk(emb, "vec_id", "embedding", qs, k=5).collect()
    pruned = ivf_topk_pruned(spark, path, qs, k=5, nprobe=len(cents)).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, pruned)) == sorted(map(key, exact))


def test_ivf_cap_rows_noop_on_balanced_data(spark, sf_test, tmp_path):
    """cap_rows above every cell's count must still write the uniform
    two-level tree (s_c == 1 everywhere) and preserve the pruned
    reader's results on the normal fixture."""
    from q_digest_spark.operators.similarity import (
        ivf_topk_pruned,
        write_embeddings_ivf,
    )

    emb, qs = _queries(spark, sf_test, 4)
    path = str(tmp_path / "emb_ivf_capped")
    cents = write_embeddings_ivf(
        emb, "vec_id", "embedding", path, n_clusters=8, cap_rows=10_000_000
    )
    pruned = ivf_topk_pruned(spark, path, qs, k=5, nprobe=len(cents))
    compute = ivf_topk(
        emb, "vec_id", "embedding", qs, k=5, n_clusters=8,
        nprobe=8, centroids=cents,
    )
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, pruned.collect())) == sorted(map(key, compute.collect()))
