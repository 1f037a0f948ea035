"""Cross-family quantile-bound matrix — wiring guard: five families,
four quantiles, every flag true at the unit scale (each family's own
bound logic is exercised in depth by its per-family suite; this
pins the fused one-scan build + shared grading pass)."""

from tests.conftest import SF_UNIT


def test_quantile_bound_matrix_all_families_green(spark):
    from __spark_entry__ import PS_DEFAULT, q_quantile_bound_matrix

    rows = q_quantile_bound_matrix(spark, SF_UNIT).collect()
    assert len(rows) == 20
    fams = {r["family"] for r in rows}
    assert fams == {"qdigest", "kll", "tdigest", "ddsketch", "gk"}
    assert {r["p"] for r in rows} == set(float(p) for p in PS_DEFAULT)
    # one shared n, and every family meets its own published bound
    assert len({r["n"] for r in rows}) == 1 and rows[0]["n"] > 0
    bad = [(r["family"], r["p"]) for r in rows if not r["within_bound"]]
    assert not bad, bad
