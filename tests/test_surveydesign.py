"""Neyman allocation (operators/surveydesign.py): hand-checked
fixture, budget conservation, zero-variance strata, and the
variance-optimality property vs proportional allocation."""

import math

import numpy as np

from q_digest_spark.operators.surveydesign import neyman_allocation


def _mk(spark, groups):
    rows = [(k, float(v)) for k, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "lang string, x double")


def test_hand_fixture(spark):
    # stratum a: N=4, values 0/0/10/10 -> var_num = 4*200 - 400 = 400,
    #   nsigma = 20; stratum b: N=2, values 3/5 -> var_num = 2*34 - 64
    #   = 4, nsigma = 2; stratum c constant -> nsigma 0, dropped
    df = _mk(spark, {"a": [0, 0, 10, 10], "b": [3, 5], "c": [7, 7, 7]})
    out = {r["key"]: r.asDict() for r in neyman_allocation(df, "lang", "x", 11).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["weight"] == 20 and out["b"]["weight"] == 2
    assert out["a"]["n_rows"] == 4 and out["b"]["n_rows"] == 2
    # Hamilton on (20, 2) with 11 seats: quotas 10.0 and 1.0 exactly
    assert out["a"]["seats_alloc"] == 10 and out["b"]["seats_alloc"] == 1


def test_budget_conserved_and_weights_match_numpy(spark):
    rng = np.random.default_rng(11)
    groups = {
        f"g{i}": rng.normal(50, 1 + 3 * i, size=20 + 30 * i).round(0).tolist()
        for i in range(5)
    }
    df = _mk(spark, groups)
    out = {r["key"]: r.asDict() for r in neyman_allocation(df, "lang", "x", 1000).collect()}
    assert sum(r["seats_alloc"] for r in out.values()) == 1000
    for k, vals in groups.items():
        a = np.asarray(vals, dtype=np.int64)
        var_num = len(a) * int((a * a).sum()) - int(a.sum()) ** 2
        want = math.floor(math.sqrt(var_num) + 0.5)
        if want > 0:
            assert out[k]["weight"] == want, k


def test_neyman_beats_proportional_variance(spark):
    """The point of the method: for the stratified-mean estimator with
    per-stratum SRS, Var = sum(N_h^2 sigma_h^2 / n_h) / N^2 is lower
    under Neyman n_h than under proportional n_h ~ N_h."""
    rng = np.random.default_rng(5)
    groups = {
        "low": (rng.normal(100, 1, 400)).tolist(),  # big, quiet
        "high": (rng.normal(100, 60, 100)).tolist(),  # small, wild
    }
    df = _mk(spark, groups)
    out = {r["key"]: r.asDict() for r in neyman_allocation(df, "lang", "x", 100).collect()}
    sig2 = {
        k: np.var(np.asarray(v, dtype=np.float64).round(0)) for k, v in groups.items()
    }
    n_tot = sum(len(v) for v in groups.values())

    def strat_var(nh):
        return sum(
            (len(groups[k]) ** 2) * sig2[k] / max(1, nh[k]) for k in groups
        ) / n_tot**2

    ney = {k: out[k]["seats_alloc"] for k in groups}
    prop = {k: round(100 * len(groups[k]) / n_tot) for k in groups}
    assert strat_var(ney) < strat_var(prop)
    # the wild small stratum must get MORE than its proportional share
    assert ney["high"] > prop["high"]
