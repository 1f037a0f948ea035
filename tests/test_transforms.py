"""Broadcast-model transforms and incremental dedup:
percentile_transform (exact + compressed bound), zscore_outlier_flags
(numpy parity), centroid_cosine_scores (numpy parity), and
incremental_dedup — including a deliberately undersized Bloom filter
to prove false positives cannot change the result.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from q_digest_spark.operators.dedup import incremental_dedup
from q_digest_spark.operators.outliers import zscore_outlier_flags
from q_digest_spark.operators.quantiles import percentile_transform
from q_digest_spark.operators.similarity import centroid_cosine_scores


# ----------------------------------------------------- incremental dedup
def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_planted(spark):
    hist = _mk_docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon")])
    new = _mk_docs(
        spark,
        [
            (10, "alpha  beta"),   # dup of 1 after whitespace normalization
            (11, "GAMMA DELTA"),   # dup of 2 after lowercasing
            (12, "zeta eta"),      # novel
            (13, "epsilon"),       # dup of 3
            (14, "theta"),         # novel
        ],
    )
    kept = {r["doc_id"] for r in incremental_dedup(new, hist, "text", "doc_id").collect()}
    assert kept == {12, 14}


def test_incremental_dedup_false_positives_harmless(spark):
    # 64-bit filter over 200 historical docs: essentially every probe
    # is a false positive — the exact confirmation join must still
    # keep every genuinely novel doc.
    hist = _mk_docs(spark, [(i, f"hist doc {i}") for i in range(200)])
    new = _mk_docs(
        spark,
        [(1100 + i, f"hist doc {i}") for i in range(10)]      # 10 dups
        + [(1200 + i, f"novel doc {i}") for i in range(10)],  # 10 novel
    )
    kept = {
        r["doc_id"]
        for r in incremental_dedup(new, hist, "text", "doc_id", m_bits=64, k=2).collect()
    }
    assert kept == {1200 + i for i in range(10)}


def test_incremental_dedup_empty_history(spark):
    # first day of the pipeline: no history at all — every new row
    # survives (previously raised AttributeError via bloom_of → None)
    hist = _mk_docs(spark, []).where(F.lit(False))
    new = _mk_docs(spark, [(10, "a"), (11, "b")])
    kept = {r["doc_id"] for r in incremental_dedup(new, hist, "text", "doc_id").collect()}
    assert kept == {10, 11}
    # history with only NULL content behaves the same
    hist2 = spark.createDataFrame([(1, None)], "doc_id long, text string")
    kept2 = {r["doc_id"] for r in incremental_dedup(new, hist2, "text", "doc_id").collect()}
    assert kept2 == {10, 11}


def test_incremental_dedup_within_batch_dups_kept(spark):
    # dedup is against HISTORY only: two identical novel docs both
    # survive (intra-batch dedup is exact_dedup's job)
    hist = _mk_docs(spark, [(1, "old")])
    new = _mk_docs(spark, [(10, "same new"), (11, "same new")])
    kept = {r["doc_id"] for r in incremental_dedup(new, hist, "text", "doc_id").collect()}
    assert kept == {10, 11}


# -------------------------------------------------- percentile transform
def test_percentile_transform_exact_matches_pandas(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 500),
            "v": rng.integers(0, 1000, 500),
        }
    )
    df = spark.createDataFrame(pdf.assign(v=pdf.v.astype("int64")))
    out = percentile_transform(df, ["g"], "v", k=0).toPandas()
    for g, grp in pdf.groupby("g"):
        vals = np.sort(grp.v.to_numpy())
        sub = out[out.g == g]
        exact = np.searchsorted(vals, sub.v.to_numpy(), side="right")
        assert (sub.pct_rank_rank.to_numpy() == exact).all()
        assert np.allclose(sub.pct_rank.to_numpy(), exact / len(vals))
        assert (sub.pct_rank_n == len(vals)).all()


def test_percentile_transform_compressed_within_bound(spark):
    rng = np.random.default_rng(11)
    v = rng.zipf(1.3, 2000).clip(max=100_000).astype("int64")
    df = spark.createDataFrame(pd.DataFrame({"g": "x", "v": v}))
    k = 32
    out = percentile_transform(df, ["g"], "v", k=k).toPandas()
    vals = np.sort(v)
    exact = np.searchsorted(vals, out.v.to_numpy(), side="right")
    bits = int(np.ceil(np.log2(max(2, int(v.max()) + 1))))
    bound = bits / k * len(v) + 2
    assert np.abs(out.pct_rank_rank.to_numpy() - exact).max() <= bound


def test_percentile_transform_null_values(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None)], "g string, v long"
    )
    out = percentile_transform(df, ["g"], "v", k=0).toPandas()
    nulls = out[out.v.isna()]
    assert len(nulls) == 1 and nulls.pct_rank.isna().all()
    assert out[~out.v.isna()].pct_rank.notna().all()


# --------------------------------------------------------- zscore flags
def test_zscore_flags_match_numpy(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["p", "q"], 400),
            "v": rng.normal(1000, 250, 400).round().astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = zscore_outlier_flags(df, ["g"], "v", thresholds=(1, 2)).toPandas()
    for g, grp in pdf.groupby("g"):
        v = grp.v.to_numpy(dtype=np.float64)
        z = np.abs(v - v.mean()) / v.std()  # population std
        sub = out[out.g == g].sort_values("v")
        ref = grp.assign(z=z).sort_values("v")
        assert (sub.z_gt_1.to_numpy() == (ref.z.to_numpy() > 1)).all()
        assert (sub.z_gt_2.to_numpy() == (ref.z.to_numpy() > 2)).all()


def test_zscore_zero_variance_group(spark):
    df = spark.createDataFrame([("c", 5)] * 4, "g string, v long")
    out = zscore_outlier_flags(df, ["g"], "v").toPandas()
    assert not out.z_gt_2.any() and not out.z_gt_3.any()


# ----------------------------------------------------- centroid scoring
def test_centroid_scores_match_numpy(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 60)
    pdf = pd.DataFrame(
        {"id": range(60), "label": labels, "vec": [list(map(float, r)) for r in vecs]}
    )
    df = spark.createDataFrame(pdf, "id long, label long, vec array<float>")
    out = (
        centroid_cosine_scores(df, "label", "vec")
        .select("id", "cos_q")
        .toPandas()
        .set_index("id")
        .cos_q
    )
    scale = 100_000
    q = np.floor(vecs.astype(np.float64) * scale + 0.5)
    for lab in np.unique(labels):
        cent = q[labels == lab].sum(axis=0)
        for i in np.nonzero(labels == lab)[0]:
            cos = q[i] @ cent / (np.sqrt(q[i] @ q[i]) * np.sqrt(cent @ cent))
            assert out[i] == np.floor(cos * 1_000_000 + 0.5)


def test_centroid_scores_zero_vector_null(spark):
    df = spark.createDataFrame(
        [(0, 1, [0.0, 0.0]), (1, 1, [1.0, 2.0]), (2, 1, [2.0, 1.0])],
        "id long, label long, vec array<float>",
    )
    out = centroid_cosine_scores(df, "label", "vec").toPandas().set_index("id")
    assert pd.isna(out.loc[0, "cos_q"])
    assert out.loc[[1, 2], "cos_q"].notna().all()


def test_counting_bloom_of_zero_weight_partition_not_dropped(spark):
    """A partition whose signed weights sum to zero still carries
    nonzero counters — partial_sketches must emit it (regression for
    the rows==0 drop)."""
    from q_digest_spark.operators.quantiles import counting_bloom_of

    df = spark.createDataFrame(
        [(10, 1), (20, -1)], "key long, w long"
    ).coalesce(1)  # one partition, net weight 0
    cbf = counting_bloom_of(df, "key", weight_col="w", m_slots=1 << 10, k=3)
    assert cbf is not None
    assert cbf.counts.any()
    assert cbf.n_pos == 1 and cbf.n_neg == 1


def test_counting_bloom_of_distributed_delete_stream(spark):
    """Insert and delete streams as separate partitions; the merged
    filter keeps exactly the survivors; probe column round-trips
    through the JVM xxhash64 path."""
    from pyspark.sql import functions as F

    from q_digest_spark.operators.membership import counting_bloom_probe_column
    from q_digest_spark.operators.quantiles import counting_bloom_of

    ins = spark.range(0, 500).select(F.col("id").alias("key"), F.lit(1).alias("w"))
    dels = spark.range(0, 250).select(F.col("id").alias("key"), F.lit(-1).alias("w"))
    cbf = counting_bloom_of(
        ins.unionByName(dels).repartition(8), "key", weight_col="w",
        m_slots=1 << 14, k=7,
    )
    probe = spark.range(0, 600).select(F.col("id").alias("key"))
    got = counting_bloom_probe_column(probe, "key", cbf, "hit").toPandas()
    got = got.set_index("key").hit
    assert got.loc[250:499].all()          # zero false negatives
    assert got.loc[0:249].sum() <= 3       # deletions took effect
    assert got.loc[500:599].sum() <= 3     # never-inserted ~ FP rate
