"""Distributed prefix scan / KS statistic, mixture sampling, and the
char-bigram LM scorer: numpy/local-oracle parity plus the adversarial
shapes (bucket-spanning batches, saturated strata, short docs).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from q_digest_spark.operators.ecdf import ks_2sample, prefix_scan
from q_digest_spark.operators.lm import lm_quality_scores
from q_digest_spark.operators.sampling import mixture_sample


# ------------------------------------------------------------ prefix scan
def test_prefix_scan_matches_numpy(spark):
    rng = np.random.default_rng(2)
    vals = rng.choice(20_000, 5_000, replace=False).astype("int64")
    c = rng.integers(1, 9, len(vals)).astype("int64")
    df = spark.createDataFrame(pd.DataFrame({"v": vals, "c1": c}))
    out = (
        prefix_scan(df, "v", ["c1"], partitions=8)
        .toPandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    order = np.argsort(vals, kind="mergesort")
    expect = c[order].cumsum()
    assert (out.cum_c1.to_numpy() == expect).all()
    assert (out.v.to_numpy() == vals[order]).all()


def test_prefix_scan_single_bucket_degenerate(spark):
    # constant value column: approxQuantile returns one cut, every row
    # lands in one bucket — the scan must still be a plain cumsum
    df = spark.createDataFrame(
        pd.DataFrame({"v": [5] * 40, "c1": range(40)})
    )
    out = prefix_scan(df, "v", ["c1"], partitions=8).toPandas()
    assert len(out) == 1 or out.cum_c1.max() == sum(range(40))


def test_ks_matches_numpy_and_is_deterministic(spark):
    rng = np.random.default_rng(9)
    a = rng.normal(100, 15, 4000).round().astype("int64")
    b = rng.normal(110, 20, 3000).round().astype("int64")
    pdf = pd.DataFrame(
        {"g": ["x"] * len(a) + ["y"] * len(b), "v": np.concatenate([a, b])}
    )
    df = spark.createDataFrame(pdf)
    vals = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), vals, side="right").astype(np.int64)
    f2 = np.searchsorted(np.sort(b), vals, side="right").astype(np.int64)
    want = int(np.abs(f1 * len(b) - f2 * len(a)).max())
    for _ in range(2):  # repeat: partition-shape independence
        r = ks_2sample(df, "g", "v", "x", "y", partitions=8).collect()[0]
        assert (r["n1"], r["n2"], r["ks_num"]) == (len(a), len(b), want)


def test_ks_identical_distributions_zero(spark):
    rows = [(g, v) for v in range(500) for g in ("x", "y")]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    r = ks_2sample(spark.createDataFrame(pdf), "g", "v", "x", "y").collect()[0]
    assert r["ks_num"] == 0 and r["n1"] == r["n2"] == 500


# --------------------------------------------------------- mixture sample
def test_mixture_sample_rates_and_saturation(spark):
    rng = np.random.default_rng(4)
    langs = ["aa"] * 800 + ["bb"] * 150 + ["cc"] * 50
    pdf = pd.DataFrame({"k": range(len(langs)), "lang": langs})
    df = spark.createDataFrame(pdf)
    shares = {"aa": 0.4, "bb": 0.2, "cc": 0.4}
    kept, rates = mixture_sample(df, "lang", "k", shares, budget=500)
    # cc: 0.4*500 = 200 wanted of 50 present -> saturates
    assert rates["cc"] == 1.0 and rates["aa"] < 1.0
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["cc"] == 50
    # md5-rate sampling is approximate: within 4 sigma of n*rate
    for s in ("aa", "bb"):
        n = {"aa": 800, "bb": 150}[s]
        exp = n * rates[s]
        assert abs(got.get(s, 0) - exp) <= 4 * np.sqrt(exp) + 1


def test_mixture_sample_deterministic_and_drops_unlisted(spark):
    df = spark.createDataFrame(
        [(i, "aa" if i % 2 else "zz") for i in range(100)], "k long, lang string"
    )
    kept1, _ = mixture_sample(df, "lang", "k", {"aa": 1.0}, budget=20)
    kept2, _ = mixture_sample(df, "lang", "k", {"aa": 1.0}, budget=20)
    s1 = {r["k"] for r in kept1.collect()}
    assert s1 == {r["k"] for r in kept2.collect()}
    assert all(k % 2 for k in s1)  # zz rows gone


# ---------------------------------------------------------------- LM score
def _local_lm_scores(pdf):
    """Plain-python oracle of lm_quality_scores."""
    import re
    norm = {
        r.doc_id: re.sub(r"[ \t\n\r\f]+", " ", r.text.lower()).strip()
        for r in pdf.itertuples()
    }
    langs = {r.doc_id: r.lang for r in pdf.itertuples()}
    cnt, pref, charset = {}, {}, {}
    for d, t in norm.items():
        if len(t) < 2:
            continue
        lg = langs[d]
        for i in range(len(t) - 1):
            b = t[i:i + 2]
            cnt[(lg, b)] = cnt.get((lg, b), 0) + 1
            pref[(lg, b[0])] = pref.get((lg, b[0]), 0) + 1
            charset.setdefault(lg, set()).add(b[1])
    out = {}
    for d, t in norm.items():
        if len(t) < 2:
            continue
        lg = langs[d]
        v = len(charset[lg])
        s = 0.0
        for i in range(len(t) - 1):
            b = t[i:i + 2]
            s += np.log(cnt[(lg, b)] + 1.0) - np.log(pref[(lg, b[0])] + float(v))
        out[d] = s / (len(t) - 1)
    return out


def test_lm_scores_match_local_oracle(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "lang": ["en", "en", "en", "de", "de", "en"],
            "text": [
                "the quick brown fox jumps",
                "the lazy dog sleeps all day",
                "xqzj qxjz zjxq",          # un-English char salad
                "der schnelle braune fuchs",
                "die faulen hunde schlafen",
                "a",                        # too short: no output row
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["id"]: r["avg_logp"]
        for r in lm_quality_scores(df, "text", "lang", "doc_id").collect()
    }
    want = _local_lm_scores(pdf)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def _local_psi(v1, v2, n_buckets=10):
    import math

    hi = max(max(v1), max(v2))
    step = hi // n_buckets + 1
    c1 = [0] * n_buckets
    c2 = [0] * n_buckets
    for v in v1:
        c1[v // step] += 1
    for v in v2:
        c2[v // step] += 1
    n1, n2 = len(v1), len(v2)
    psi = 0.0
    for i in range(n_buckets):
        p1 = (c1[i] + 1) / (n1 + n_buckets)
        p2 = (c2[i] + 1) / (n2 + n_buckets)
        psi += (p1 - p2) * math.log(p1 / p2)
    return n1, n2, psi


def test_psi_matches_local_oracle(spark):
    from q_digest_spark.operators.ecdf import psi_binned

    rng = np.random.default_rng(7)
    a = rng.integers(0, 1000, 400).tolist()
    b = (rng.integers(0, 1000, 300) + 400).tolist()  # shifted: drift
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    got = psi_binned(df, "g", "v", "a", "b").collect()[0]
    n1, n2, want = _local_psi(a, b)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["psi"] - want) < 1e-12
    assert got["psi"] > 0.1  # planted shift is visible drift


def test_psi_identical_distributions_near_zero(spark):
    from q_digest_spark.operators.ecdf import psi_binned

    rows = [(g, int(v)) for g in ("a", "b") for v in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = psi_binned(df, "g", "v", "a", "b").collect()[0]
    assert got["psi"] == 0.0  # identical counts bucket-for-bucket


def test_psi_rejects_negatives_and_empty(spark):
    from q_digest_spark.operators.ecdf import psi_binned

    df = spark.createDataFrame(
        [("a", -5), ("a", 10), ("b", 20)], "g string, v long"
    )
    got = psi_binned(df, "g", "v", "a", "b").collect()[0]
    assert (got["n1"], got["n2"]) == (1, 1)  # negative row excluded
    empty = spark.createDataFrame([], "g string, v long")
    z = psi_binned(empty, "g", "v", "a", "b").collect()[0]
    assert (z["n1"], z["n2"], z["psi"]) == (0, 0, 0.0)


def _local_w1(v1, v2):
    """Textbook gap form: sum |F1-F2| over value gaps, scaled n1*n2."""
    from collections import Counter

    c1, c2 = Counter(v1), Counter(v2)
    vs = sorted(set(v1) | set(v2))
    n1, n2 = len(v1), len(v2)
    num = 0
    cum1 = cum2 = 0
    for i, v in enumerate(vs[:-1]):
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        num += abs(cum1 * n2 - cum2 * n1) * (vs[i + 1] - v)
    return num


def test_w1_matches_gap_oracle_and_scipy_shape(spark):
    from q_digest_spark.operators.ecdf import w1_2sample

    rng = np.random.default_rng(11)
    a = rng.integers(0, 500, 300).tolist()
    b = (rng.integers(0, 500, 260) + 37).tolist()
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    got = w1_2sample(df, "g", "v", "a", "b").collect()[0]
    assert (got["n1"], got["n2"]) == (300, 260)
    assert int(got["w1_num"]) == _local_w1(a, b)
    # the shift should be visible: W1 ~ 37 for a +37 translation
    w1 = int(got["w1_num"]) / (300 * 260)
    assert 25 < w1 < 50, w1


def test_w1_identical_and_disjoint(spark):
    from q_digest_spark.operators.ecdf import w1_2sample

    same = [("a", i) for i in range(100)] + [("b", i) for i in range(100)]
    df = spark.createDataFrame(same, "g string, v long")
    assert int(w1_2sample(df, "g", "v", "a", "b").collect()[0]["w1_num"]) == 0

    # point masses at 0 and 1000: W1 == 1000 exactly
    pm = [("a", 0)] * 5 + [("b", 1000)] * 3
    df2 = spark.createDataFrame(pm, "g string, v long")
    r = w1_2sample(df2, "g", "v", "a", "b").collect()[0]
    assert int(r["w1_num"]) == 1000 * 5 * 3

    # one side empty: defined zero, no crash
    df3 = spark.createDataFrame([("a", 1)], "g string, v long")
    z = w1_2sample(df3, "g", "v", "a", "b").collect()[0]
    assert (z["n1"], z["n2"], int(z["w1_num"])) == (1, 0, 0)


def _local_mwu_x2(a, b):
    # brute-force pairwise definition: 2*U1 = sum 2*[x>y] + [x==y]
    tot = 0
    for x in a:
        for y in b:
            if x > y:
                tot += 2
            elif x == y:
                tot += 1
    return tot


def test_mwu_matches_pairwise_bruteforce(spark):
    from q_digest_spark.operators.ecdf import mwu_2sample

    rng = np.random.default_rng(23)
    a = rng.integers(0, 40, 250).tolist()  # heavy ties on purpose
    b = (rng.integers(0, 40, 190) + 5).tolist()
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    got = mwu_2sample(df, "g", "v", "a", "b", partitions=8).collect()[0]
    assert (got["n1"], got["n2"]) == (250, 190)
    assert int(got["u1_x2"]) == _local_mwu_x2(a, b)


def test_mwu_identities(spark):
    from q_digest_spark.operators.ecdf import mwu_2sample

    # identical distributions: U1 = n1*n2/2 exactly (all ties resolve
    # symmetrically), so u1_x2 == n1*n2
    same = [("a", i % 7) for i in range(70)] + [("b", i % 7) for i in range(70)]
    df = spark.createDataFrame(same, "g string, v long")
    r = mwu_2sample(df, "g", "v", "a", "b").collect()[0]
    assert int(r["u1_x2"]) == 70 * 70

    # complete separation: a all above b -> u1_x2 == 2*n1*n2
    sep = [("a", 100 + i) for i in range(9)] + [("b", i) for i in range(4)]
    df2 = spark.createDataFrame(sep, "g string, v long")
    r2 = mwu_2sample(df2, "g", "v", "a", "b").collect()[0]
    assert int(r2["u1_x2"]) == 2 * 9 * 4

    # one side empty: defined zero, no crash
    df3 = spark.createDataFrame([("a", 1)], "g string, v long")
    z = mwu_2sample(df3, "g", "v", "a", "b").collect()[0]
    assert (z["n1"], z["n2"], int(z["u1_x2"])) == (1, 0, 0)
