"""Multivariate OLS by exact Cramer determinants — closed-form
least-squares over integer features with NO float ever entering the
fit (the multi-feature generalization of operators/bivariate.py).

A quality/length model over corpus features (predict tokens from
chars + type count, predict engagement from length + links, ...) is
the classic one-pass distributed regression: the normal equations
(X^T X) b = X^T y need only the feature SUFFICIENT STATISTICS —
sums, squares, and cross products — which are mergeable by plain
addition, so Spark's own map-side-combined ``groupBy().agg(sum())``
IS the whole distributed step. With p features the aggregate carries
(p+1)(p+2)/2 + p + 1 numbers regardless of row count.

Float ``solve()`` is engine-portable only to ulp noise; this
operator solves the 3x3 system by CRAMER'S RULE on arbitrary-
precision Python ints: every determinant is an integer polynomial in
the exact sums, so coefficients are exact rationals det_i/det,
reported ppm-quantized with the repo's magnitude rounding (CLAUDE.md
int-div note). A DuckDB oracle replays the identical HUGEINT
polynomial bit-for-bit.

int64/HUGEINT domain: with |x| <= C and n rows the Gram entries are
<= n*C^2 and the 3x3 determinants <= ~6*(n*C^2)^3 — Python ints
never overflow; the ORACLE'S HUGEINT (<1.7e38) holds to n*C^2 ~
3.7e12 (e.g. 10^9 rows of 600-char documents). Beyond that, grade a
sampled fixture or lift the oracle to a multi-word decomposition.

Public methodology (Gauss 1809 normal equations; Cramer 1750); no
reference counterpart (qcore.c has no relational layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


_STAT_KEYS = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")


def ols_sufficient_stats(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    keys: tuple[str, ...] = (),
) -> dict:
    """One distributed pass -> the nine exact sums of the 2-feature
    (+ intercept) normal equations: n, s1, s2, s11, s12, s22, sy,
    s1y, s2y. Integer-valued columns required (quantize floats
    upstream); accumulation in decimal(38,0) like bivariate_stats.

    With ``keys`` the same pass groups by those columns and returns
    {key_tuple: stats_dict} — the per-group stats are mergeable by
    plain addition (and SUBTRACTION: total minus a fold's stats is
    the fold-complement training fit, the exact K-fold CV trick)."""
    x1 = F.col(x1_col).cast("decimal(19,0)")
    x2 = F.col(x2_col).cast("decimal(19,0)")
    y = F.col(y_col).cast("decimal(19,0)")
    d = df.where(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).cast("decimal(38,0)").alias("s1"),
        F.sum(x2).cast("decimal(38,0)").alias("s2"),
        F.sum(x1 * x1).cast("decimal(38,0)").alias("s11"),
        F.sum(x1 * x2).cast("decimal(38,0)").alias("s12"),
        F.sum(x2 * x2).cast("decimal(38,0)").alias("s22"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(x1 * y).cast("decimal(38,0)").alias("s1y"),
        F.sum(x2 * y).cast("decimal(38,0)").alias("s2y"),
    ]
    if not keys:
        row = d.agg(*aggs).collect()[0]
        return {k: int(row[k]) for k in _STAT_KEYS}
    rows = d.groupBy(*[F.col(k) for k in keys]).agg(*aggs).collect()
    return {
        tuple(r[k] for k in keys): {k: int(r[k]) for k in _STAT_KEYS}
        for r in rows
    }


def stats_subtract(total: dict, part: dict) -> dict:
    """total - part, the fold-complement training statistics."""
    return {k: total[k] - part[k] for k in _STAT_KEYS}


def _det3(m: list[list[int]]) -> int:
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _ppm(num: int, den: int) -> int:
    """sign(num/den) * round_half_away(1e6*|num/den|) on exact ints."""
    if den < 0:
        num, den = -num, -den
    mag = (2 * PPM * abs(num) + den) // (2 * den)
    return mag if num >= 0 else -mag


def ols_cramer(stats: dict[str, int]) -> tuple[int, int, int, int]:
    """(det_sign, b0_ppm, b1_ppm, b2_ppm) for
    y ~ b0 + b1*x1 + b2*x2 from the exact sufficient statistics.

    Cramer on the symmetric normal matrix
        [[n,  s1,  s2 ], [s1, s11, s12], [s2, s12, s22]]
    with RHS (sy, s1y, s2y). Degenerate design (det <= 0 up to sign
    collinearity; det == 0 exactly when the features are affinely
    dependent) -> (0, 0, 0, 0); both engines apply the same guard.
    """
    n, s1, s2 = stats["n"], stats["s1"], stats["s2"]
    s11, s12, s22 = stats["s11"], stats["s12"], stats["s22"]
    sy, s1y, s2y = stats["sy"], stats["s1y"], stats["s2y"]
    a = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    det = _det3(a)
    if det == 0:
        return (0, 0, 0, 0)
    rhs = [sy, s1y, s2y]
    dets = []
    for i in range(3):
        m = [row[:] for row in a]
        for r in range(3):
            m[r][i] = rhs[r]
        dets.append(_det3(m))
    sign = 1 if det > 0 else -1
    return (sign, _ppm(dets[0], det), _ppm(dets[1], det), _ppm(dets[2], det))
