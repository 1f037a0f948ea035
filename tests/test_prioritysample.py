"""Priority sampling (Duffield-Lund-Thorup JACM'07): the sketch class
(sketches/prioritysample.py) and the distributed engine-portable
operator (operators/sampling.priority_sample / priority_subset_sums).

The class and the operator share the integer-priority contract
(p = floor(w * 2^32 / (h+1))) but derive h differently (splitmix64
vs md5); each is tested against its own invariants, and the operator
additionally against a numpy re-implementation of the md5 contract.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from q_digest_spark.sketches.prioritysample import PrioritySample

KEYS = [f"k{i}" for i in range(4000)]
RNG = np.random.default_rng(7)
W = RNG.integers(1, 2000, 4000)
TRUTH = int(W.sum())


def test_exact_regime_below_k():
    s = PrioritySample(k=16)
    s.update_batch(KEYS[:10], W[:10])
    assert s.tau == 0
    assert s.estimate_total() == int(W[:10].sum())
    assert s.subset_sum(KEYS[:3]) == int(W[:3].sum())


def test_merge_equals_oneshot_and_idempotent():
    a = PrioritySample(k=48)
    a.update_batch(KEYS, W)
    parts = []
    for lo in range(0, 4000, 700):
        t = PrioritySample(k=48)
        t.update_batch(KEYS[lo : lo + 700], W[lo : lo + 700])
        parts.append(t)
    m = parts[3]
    for t in parts[:3] + parts[4:]:
        m.merge(t)
    assert list(m.keys) == list(a.keys)
    assert list(m.prio) == list(a.prio)
    # idempotent: re-merging the full sketch changes nothing
    m.merge(a)
    assert list(m.keys) == list(a.keys)
    assert m.tau == a.tau


def test_serialization_roundtrip():
    a = PrioritySample(k=32, seed=5)
    a.update_batch(KEYS, W)
    b = PrioritySample.from_bytes(a.to_bytes())
    assert list(b.keys) == list(a.keys)
    assert list(b.weights) == list(a.weights)
    assert b.tau == a.tau and b.k == a.k and b.seed == a.seed
    assert b.estimate_total() == a.estimate_total()


def test_unbiased_over_seeds():
    """Mean estimate over 200 hash seeds within 3% of the true total
    (rel std of the mean ~ 1/sqrt(63*200) ~ 0.9%)."""
    ests = []
    sub = set(KEYS[::4])
    subt = int(W[::4].sum())
    sub_ests = []
    for seed in range(200):
        s = PrioritySample(k=64, seed=seed)
        s.update_batch(KEYS, W)
        ests.append(s.estimate_total())
        sub_ests.append(s.subset_sum(sub))
    assert abs(np.mean(ests) - TRUTH) / TRUTH < 0.03
    assert abs(np.mean(sub_ests) - subt) / subt < 0.05


def test_weight_domain_validation():
    s = PrioritySample(k=8)
    with pytest.raises(ValueError):
        s.update_batch(["a"], [0])
    with pytest.raises(ValueError):
        s.update_batch(["a"], [1 << 31])
    with pytest.raises(ValueError):
        PrioritySample(k=8, seed=1).merge(PrioritySample(k=8, seed=2))


def _md5_priorities(keys, weights, salt):
    out = []
    for k, w in zip(keys, weights):
        h = int(hashlib.md5(f"{k}:{salt}".encode()).hexdigest()[:8], 16)
        out.append((int(w) << 32) // (h + 1))
    return out


def test_operator_matches_reference_contract(spark):
    """priority_sample's JVM plan reproduces the md5 integer-priority
    contract computed independently in Python."""
    from q_digest_spark.operators.sampling import priority_sample

    rows = [(i, f"d{i}", int(W[i])) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, name string, w long")
    got = priority_sample(df, "doc_id", "w", 20, salt="t1").collect()
    assert len(got) == 21
    ps = _md5_priorities([r[0] for r in rows], [r[2] for r in rows], "t1")
    order = sorted(range(300), key=lambda i: (-ps[i], rows[i][0]))[:21]
    assert [r["doc_id"] for r in got] == [rows[i][0] for i in order]
    assert [r["__p"] for r in got] == [ps[i] for i in order]


def test_subset_sums_exact_regime_and_estimator(spark):
    from q_digest_spark.operators.sampling import priority_subset_sums

    rows = [(i, "g" + str(i % 3), int(W[i])) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    # k >= n: tau = 0, estimates are the exact group sums
    exact = {}
    for i, g, w in rows:
        exact[g] = exact.get(g, 0) + w
    got = {
        r["g"]: r["est_sum"]
        for r in priority_subset_sums(df, "doc_id", "w", ["g"], k=500).collect()
    }
    assert got == exact
    # k < n: estimates match the python DLT estimator on md5 priorities
    ps = _md5_priorities([r[0] for r in rows], [r[2] for r in rows], "ps")
    order = sorted(range(200), key=lambda i: (-ps[i], rows[i][0]))
    tau = ps[order[24]]
    want = {}
    for i in order[:24]:
        g, w = rows[i][1], rows[i][2]
        want[g] = want.get(g, 0) + max(w, tau)
    got = {
        r["g"]: r["est_sum"]
        for r in priority_subset_sums(df, "doc_id", "w", ["g"], k=24).collect()
    }
    assert got == want


def test_operator_plan_is_take_ordered(spark):
    """The top-(k+1) must compile to TakeOrderedAndProject (per-
    partition heaps), never a global Sort + Exchange."""
    from q_digest_spark.operators.sampling import priority_sample

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    plan = priority_sample(df, "doc_id", "w", 64)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
