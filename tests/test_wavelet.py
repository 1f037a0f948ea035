"""Haar wavelet synopsis: exact-transform parity with a local numpy
reference, K-term selection semantics, and full-keep reconstruction
identity."""

import numpy as np
import pytest


def _local_haar_synopsis(values, B, keep):
    """Brute-force reference: histogram, unnormalized Haar details,
    top-keep by d^2 * 2^(L-l) (tie-break level asc, index asc),
    scaled reconstruction."""
    L = B.bit_length() - 1
    hi = max(values) if len(values) else 0
    step = hi // B + 1
    c = np.zeros(B, dtype=np.int64)
    for v in values:
        c[v // step] += 1
    total = int(c.sum())
    coeffs = []  # (lvl, j, d)
    for lvl in range(1, L + 1):
        w = 1 << lvl
        for j in range(B // w):
            blk = c[j * w : (j + 1) * w]
            d = int(blk[: w // 2].sum() - blk[w // 2 :].sum())
            if d != 0:
                coeffs.append((lvl, j, d))
    coeffs.sort(key=lambda t: (-(t[2] * t[2] * (1 << (L - t[0]))), t[0], t[1]))
    kept = coeffs[:keep]
    est = np.full(B, total, dtype=np.int64)
    for lvl, j, d in kept:
        w = d * (1 << (L - lvl))
        for i in range(B):
            if i >> lvl == j:
                est[i] += w if ((i >> (lvl - 1)) & 1) == 0 else -w
    return c, est


def test_haar_full_keep_is_exact(spark):
    """Keeping ALL coefficients must reconstruct B*c exactly."""
    from q_digest_spark.operators.wavelet import haar_synopsis_hist

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, 800).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(6)
    out = haar_synopsis_hist(df, "v", n_buckets=16, keep=16).collect()
    for r in out:
        assert r["est_x16"] == 16 * r["n"], r


def test_haar_topk_matches_local_reference(spark):
    from q_digest_spark.operators.wavelet import haar_synopsis_hist

    rng = np.random.default_rng(9)
    # bimodal so the synopsis has structure to capture
    vals = np.concatenate(
        [rng.integers(0, 80, 400), rng.integers(700, 900, 300)]
    ).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(6)
    got = {
        r["b"]: (r["n"], r["est_x32"])
        for r in haar_synopsis_hist(df, "v", n_buckets=32, keep=6).collect()
    }
    c, est = _local_haar_synopsis(vals, 32, 6)
    for b in range(32):
        assert got[b] == (int(c[b]), int(est[b])), (b, got[b], c[b], est[b])
    # the K-term estimate must beat the 0-term (flat) estimate in SSE
    sse_k = sum((32 * c[b] - est[b]) ** 2 for b in range(32))
    flat = np.full(32, c.sum(), dtype=np.int64)
    sse_0 = sum((32 * c[b] - flat[b]) ** 2 for b in range(32))
    assert sse_k < sse_0


def test_haar_rejects_non_power_of_two(spark):
    from q_digest_spark.operators.wavelet import haar_synopsis_hist

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        haar_synopsis_hist(df, "v", n_buckets=20)
