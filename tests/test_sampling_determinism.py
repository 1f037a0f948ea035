"""Cross-engine determinism of the mixture_sample rate→threshold map.

The graded mixture_sample_counts query relies on Python and the SQL
oracle computing the SAME membership threshold from (budget, share, n).
Both sides evaluate ``budget * share / n`` as IEEE-754 doubles in the
same association, then floor(rate * 2^32) — only correctly-rounded
*, / ops, no libm — so the thresholds must be bit-identical for
budget, n < 2^53. This test pins that contract against DuckDB over a
grid that includes awkward shares (0.1, 0.3 — inexact binaries),
near-saturation rates, and primes that make the division non-terminating.
"""

import duckdb
import pytest

from q_digest_spark.operators.sampling import _threshold_hex


def _py_threshold(budget: int, share: float, n: int) -> str:
    rate = budget * share / n
    if rate >= 1.0:
        return "saturated"
    return _threshold_hex(rate)


def _duck_threshold(con, budget: int, share: float, n: int) -> str:
    row = con.execute(
        """
        SELECT CASE WHEN r >= 1.0 THEN 'saturated'
               ELSE printf('%08x', least(CAST(floor(r * 4294967296) AS BIGINT),
                                         4294967295))
               END
        FROM (SELECT CAST(? AS BIGINT) * CAST(? AS DOUBLE) / CAST(? AS BIGINT) AS r)
        """,
        [budget, share, n],
    ).fetchone()
    return row[0]


@pytest.mark.parametrize("share", [0.1, 0.3, 0.4, 1.0 / 3.0, 0.0001, 0.9999])
def test_threshold_matches_duckdb_grid(share):
    con = duckdb.connect()
    budgets = [1, 7, 60, 599, 6000, 59999, 1_000_003, 10**12 + 39]
    ns = [1, 3, 7, 97, 1201, 59999, 60000, 10**9 + 7]
    for budget in budgets:
        for n in ns:
            assert _py_threshold(budget, share, n) == _duck_threshold(
                con, budget, share, n
            ), (budget, share, n)
    con.close()


def test_threshold_at_exact_boundaries():
    """Rates that are exact powers of two hit the floor boundary
    exactly; both engines must land on the same side."""
    con = duckdb.connect()
    for k in range(1, 20):
        share = 1.0 / (1 << k)
        assert _py_threshold(1, share, 1) == _duck_threshold(con, 1, share, 1)
        # rate exactly 1.0 → saturated on both sides
        assert _py_threshold(1 << k, share, 1) == "saturated"
        assert _duck_threshold(con, 1 << k, share, 1) == "saturated"
    con.close()


def test_w1_micro_quantization_matches_duckdb_random():
    """The graded W1 output is an integer half-up quantization computed
    in Python ints vs DuckDB HUGEINT floor division — pin bit-equality
    over random (num, n1, n2) triples including boundary halves."""
    import random

    con = duckdb.connect()
    rng = random.Random(3)
    cases = [(0, 5, 3), (1, 2, 1), (3, 2, 3)]  # exact halves / tiny
    cases += [
        (rng.randrange(10**12), rng.randrange(1, 10**5), rng.randrange(1, 10**5))
        for _ in range(200)
    ]
    for num, n1, n2 in cases:
        d = n1 * n2
        py = (2 * 1_000_000 * num + d) // (2 * d)
        db = con.execute(
            "SELECT CAST((2*1000000*CAST(? AS HUGEINT) + CAST(? AS HUGEINT)) "
            "// (2*CAST(? AS HUGEINT)) AS BIGINT)",
            [num, d, d],
        ).fetchone()[0]
        assert py == int(db), (num, n1, n2)
    con.close()


def test_psi_sum_matches_duckdb_on_random_buckets():
    """PSI's only float steps are IEEE division and ln on identical
    doubles; pin the ppm-quantized sum against DuckDB for random exact
    bucket-count tables (the shape the graded query produces)."""
    import math
    import random

    con = duckdb.connect()
    rng = random.Random(17)
    for trial in range(50):
        B = 10
        c1 = [rng.randrange(0, 5000) for _ in range(B)]
        c2 = [rng.randrange(0, 5000) for _ in range(B)]
        n1, n2 = sum(c1), sum(c2)
        py = sum(
            ((a + 1) / (n1 + B) - (b + 1) / (n2 + B))
            * math.log(((a + 1) / (n1 + B)) / ((b + 1) / (n2 + B)))
            for a, b in zip(c1, c2)
        )
        py_ppm = int(con.execute("SELECT CAST(round(? * 1e6) AS BIGINT)", [py]).fetchone()[0])
        vals = ", ".join(f"({a}, {b})" for a, b in zip(c1, c2))
        db = con.execute(
            f"""
            WITH f(c1, c2) AS (VALUES {vals})
            SELECT CAST(round(sum(
                (CAST(c1+1 AS DOUBLE)/{n1 + B} - CAST(c2+1 AS DOUBLE)/{n2 + B})
                * ln((CAST(c1+1 AS DOUBLE)/{n1 + B}) / (CAST(c2+1 AS DOUBLE)/{n2 + B}))
            ) * 1e6) AS BIGINT) FROM f
            """
        ).fetchone()[0]
        assert py_ppm == int(db), (trial, py_ppm, db)
    con.close()
