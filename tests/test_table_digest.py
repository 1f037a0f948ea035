"""Order-independent table fingerprint (operators/profile.table_digest)
— partitioning/order invariance, single-change sensitivity, and the
NULL-vs-empty canonicalization contract."""

from pyspark.sql import functions as F


def _dg(df, cols):
    from q_digest_spark.operators.profile import table_digest

    r = table_digest(df, cols).collect()[0]
    return (r["n_rows"], r["digest_a"], r["digest_b"])


def test_digest_invariant_under_partitioning_and_order(spark):
    rows = [(i, f"text-{i % 7}", i % 3) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, t string, g long")
    base = _dg(df, ["id", "t", "g"])
    assert base == _dg(df.repartition(17, "g"), ["id", "t", "g"])
    assert base == _dg(df.orderBy(F.desc("t")), ["id", "t", "g"])
    assert base == _dg(df.coalesce(1), ["id", "t", "g"])


def test_digest_flips_on_any_single_change(spark):
    rows = [(i, f"row-{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, t string")
    base = _dg(df, ["id", "t"])
    changed = spark.createDataFrame(
        [(i, "row-42x" if i == 42 else f"row-{i}") for i in range(100)],
        "id long, t string",
    )
    got = _dg(changed, ["id", "t"])
    assert got[0] == base[0]
    assert got[1] != base[1] and got[2] != base[2]
    # dropping + re-adding a row under a different id also flips it
    moved = spark.createDataFrame(
        [(i + 1000 if i == 7 else i, f"row-{i}") for i in range(100)],
        "id long, t string",
    )
    assert _dg(moved, ["id", "t"])[1] != base[1]


def test_digest_null_vs_empty_and_column_boundaries(spark):
    a = spark.createDataFrame([(1, None)], "id long, t string")
    b = spark.createDataFrame([(1, "")], "id long, t string")
    assert _dg(a, ["id", "t"])[1] != _dg(b, ["id", "t"])[1]
    # unit-separator join: ('ab','c') must not alias ('a','bc')
    c = spark.createDataFrame([("ab", "c")], "x string, y string")
    d = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert _dg(c, ["x", "y"])[1] != _dg(d, ["x", "y"])[1]


def test_digest_merges_by_addition(spark):
    rows = [(i, f"r{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, t string")
    half1 = spark.createDataFrame(rows[:100], "id long, t string")
    half2 = spark.createDataFrame(rows[100:], "id long, t string")
    from q_digest_spark.operators.profile import MERSENNE61

    n, a, b = _dg(df, ["id", "t"])
    n1, a1, b1 = _dg(half1, ["id", "t"])
    n2, a2, b2 = _dg(half2, ["id", "t"])
    assert (n, a, b) == (
        n1 + n2,
        (a1 + a2) % MERSENNE61,
        (b1 + b2) % MERSENNE61,
    )
