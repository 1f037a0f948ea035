"""Haar wavelet synopsis: the third classic AQP summary family next
to sketches and histograms (Matias/Vitter/Wang SIGMOD'98; Garofalakis
& Gibbons' probabilistic wavelet synopses are the lossy refinement).

An equi-width histogram of B = 2^L buckets is transformed into B
Haar coefficients; keeping only the K largest (by normalized energy)
yields a K-term synopsis whose inverse transform approximates the
histogram with the minimal L2 error among K-term Haar expansions.

Everything here is INTEGER-exact and engine-portable:

- bucket edges are pure integer arithmetic (step = max div B + 1,
  bucket = v div step — the psi_binned discipline; no float boundary
  can disagree across engines);
- the transform is UNNORMALIZED (sum / difference instead of
  sum/sqrt(2)): detail d_l[j] at level l (block width 2^l) is the
  first-half-minus-second-half leaf-count sum, an integer;
- the K-term selection criterion is the normalized energy
  d^2 / 2^l, compared as the integer d^2 * 2^(L-l) with a
  deterministic (level, index) tie-break;
- reconstruction is kept scaled by B: B*c_est[i] = total +
  sum over kept details of sign * d_l[i div 2^l] * 2^(L-l), with
  sign + iff bit (l-1) of i is 0 — exact integers end to end, so any
  SQL engine reproduces every row verbatim.

Scale shape: ONE row-scaled pass (the bucket groupBy, map-side
combine). Each detail level is an O(B)-row aggregate computed
straight from the cached leaf table (no level chaining), the K kept
coefficients are a bounded ``limit`` (TakeOrdered — never a global
sort), and reconstruction is a codegen'd expression built from the
<= K collected coefficients (bounded driver data, never row-scaled).
No reference counterpart (qcore.c has no wavelet code); public
methodology only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def haar_synopsis_hist(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 256,
    keep: int = 12,
) -> DataFrame:
    """Returns (bucket, n, est_xB): the exact equi-width histogram
    count and the K-term Haar reconstruction scaled by n_buckets
    (est = est_xB / B, exact rational). Values must be non-negative
    integers (negative rows are refused up front, as in psi_binned).
    """
    levels = (n_buckets - 1).bit_length()
    if 1 << levels != n_buckets:
        raise ValueError("n_buckets must be a power of two")

    spark = df.sparkSession
    vc = F.col(value_col).cast("long")
    ev = df.where(vc.isNotNull()).select(vc.alias("__v")).where(F.col("__v") >= 0)
    hi = ev.agg(F.max("__v")).collect()[0][0]
    if hi is None:
        hi = 0
    step = int(hi) // n_buckets + 1

    counts = ev.groupBy(F.expr(f"__v div {step}").alias("b")).agg(
        F.count(F.lit(1)).alias("n")
    )
    leaves = (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(counts, "b", "left")
        .select("b", F.coalesce("n", F.lit(0)).alias("n"))
        .persist()
    )
    try:
        total = int(leaves.agg(F.sum("n")).collect()[0][0])

        coeffs = None
        for lvl in range(1, levels + 1):
            sign = F.when(
                F.shiftright(F.col("b"), lvl - 1).bitwiseAND(F.lit(1)) == 0,
                F.col("n"),
            ).otherwise(-F.col("n"))
            d = (
                leaves.groupBy(F.expr(f"b div {1 << lvl}").alias("j"))
                .agg(F.sum(sign).alias("d"))
                .select(F.lit(lvl).alias("lvl"), "j", "d")
            )
            coeffs = d if coeffs is None else coeffs.unionByName(d)

        # integer energy criterion d^2 * 2^(levels - lvl) — the
        # normalized d^2 / 2^lvl scaled by 2^levels; exact int64 for
        # |d| <= total up to ~3e9 at B=256 (lift to decimal beyond)
        energy = F.expr(f"d * d * shiftleft(1L, {levels} - lvl)")
        kept_rows = (
            coeffs.where(F.col("d") != 0)
            .orderBy(F.desc(energy), F.asc("lvl"), F.asc("j"))
            .limit(keep)
            .collect()
        )

        est = F.lit(total)
        for r in kept_rows:
            lvl, j, d = int(r["lvl"]), int(r["j"]), int(r["d"])
            w = d * (1 << (levels - lvl))
            hit = F.expr(f"b div {1 << lvl}") == j
            sgn = F.shiftright(F.col("b"), lvl - 1).bitwiseAND(F.lit(1)) == 0
            est = est + F.when(hit & sgn, F.lit(w)).otherwise(
                F.when(hit, F.lit(-w)).otherwise(0)
            )
        out = leaves.select(
            "b", "n", est.cast("long").alias(f"est_x{n_buckets}")
        )
        out = out.localCheckpoint()  # materialize before unpersist
    finally:
        leaves.unpersist()
    return out
