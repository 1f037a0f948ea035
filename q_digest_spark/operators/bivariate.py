"""Mergeable bivariate sufficient statistics -> Pearson correlation
and OLS trend slope, integer-exact end to end.

The univariate moments sketch (sketches/moments.py) stops at per-
column central moments; relationships between two metrics (does
click volume track view volume? is daily traffic trending up?) need
the BIVARIATE sufficient statistics

    (n, Sx, Sy, Sxx, Syy, Sxy)

which are mergeable by plain addition — the same partial/merge
contract every sketch in this engine uses, except here Spark's own
map-side-combined ``groupBy().agg(sum(...))`` IS the merge, so the
whole reduction stays in whole-stage codegen.

Float ``corr()``/``regr_slope()`` built-ins are engine-portable only
to libm ulp noise; this operator never lets a float exist:

* the six sums accumulate in DECIMAL(38,0) (inputs cast to
  decimal(19,0) first so the product is exact at 38 digits — the
  same ANSI-overflow-proof routing as the ppm shares, CLAUDE.md);
* the derived terms  N = n*Sxy - Sx*Sy,  Dx = n*Sxx - Sx^2,
  Dy = n*Syy - Sy^2  and the quantized outputs are computed on
  arbitrary-precision Python ints over the O(groups) aggregate rows
  (bounded by contract, like the chi-squared / autocorrelation
  queries);
* Pearson r is reported as  (sign(N), r^2 in ppm)  — r^2 =
  N^2/(Dx*Dy) is an exact rational, so NO sqrt is ever taken; the
  ppm quantization is the repo's half-up integer division on a
  non-negative numerator (engine-safe, see CLAUDE.md int-div note);
* the OLS slope N/Dx is quantized half-AWAY-from-zero on the
  magnitude with the sign re-applied, exactly like the
  autocorrelation query, so Python floor-div vs DuckDB trunc-div
  can never disagree on negative numerators.

100-TB shape: ONE row-scaled groupBy with map-side combine (the
shuffle carries six decimals per group); everything after runs on
the tiny aggregate. Public methodology (Pearson 1895; Pébay 2008
for the mergeable-moments framing); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


def bivariate_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """One distributed pass -> per-group (n, sx, sy, sxx, syy, sxy).

    ``x_col``/``y_col`` must be integer-valued columns (quantize
    floats to cents/ppm upstream — the repo-wide convention). The
    six sums come back as DECIMAL(38,0); callers do the O(groups)
    derived algebra on Python ints (``pearson_ols``).
    """
    x = F.col(x_col).cast("decimal(19,0)")
    y = F.col(y_col).cast("decimal(19,0)")
    d = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    return d.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sx"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(x * x).cast("decimal(38,0)").alias("sxx"),
        F.sum(y * y).cast("decimal(38,0)").alias("syy"),
        F.sum(x * y).cast("decimal(38,0)").alias("sxy"),
    )


def pearson_ols(
    n: int, sx: int, sy: int, sxx: int, syy: int, sxy: int,
    scale: int = PPM,
) -> tuple[int, int, int]:
    """(corr_sign, corr_sq_scaled, slope_scaled) from the six sums.

    Exact-integer algebra: N = n*sxy - sx*sy, Dx = n*sxx - sx^2,
    Dy = n*syy - sy^2 (all Python ints, never overflow).

    * corr_sign   = -1/0/+1 = sign(N) (0 also when either variance
      term is zero — correlation undefined, reported as 0).
    * corr_sq     = round_half_up(scale * N^2 / (Dx*Dy)), in
      [0, scale]; numerator non-negative so plain ``//`` half-up is
      engine-safe.
    * slope       = sign(N) * round_half_up(scale * |N| / Dx) —
      magnitude-rounded so Python floor-div == DuckDB trunc-div.

    Degenerate guard: zero Dx (constant x) or zero Dy (constant y)
    -> (0, 0, 0); both engines must apply the same guard.
    """
    n, sx, sy = int(n), int(sx), int(sy)
    sxx, syy, sxy = int(sxx), int(syy), int(sxy)
    N = n * sxy - sx * sy
    Dx = n * sxx - sx * sx
    Dy = n * syy - sy * sy
    if Dx <= 0 or Dy <= 0:
        return (0, 0, 0)
    sign = 1 if N > 0 else (-1 if N < 0 else 0)
    corr_sq = (2 * scale * N * N + Dx * Dy) // (2 * Dx * Dy)
    slope_mag = (2 * scale * abs(N) + Dx) // (2 * Dx)
    return (sign, corr_sq, sign * slope_mag)
