"""Mirror of the driver's correctness gate: run every queries() entry
at sf0.001/sf0.01 and compare against its oracle_sql() via DuckDB —
row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _coerce(v):
    import math

    import numpy as np

    if v is None:
        return "None"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, float, np.integer, np.floating)):
        # DuckDB .df() renders a NULL in a nullable BIGINT/DOUBLE
        # column as float NaN; Spark collect() gives None — same value
        if isinstance(v, (float, np.floating)) and math.isnan(float(v)):
            return "None"
        return repr(round(float(v), 9))
    return str(v)


def _norm(rows, cols):
    out = [tuple(_coerce(r[c]) for c in sorted(cols)) for r in rows]
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, sf_test, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_test)
    spark_rows = [r.asDict() for r in sdf.collect()]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    con = _duck(sf_test)
    odf = con.execute(oracles[name]).df()
    assert sorted(c.lower() for c in odf.columns) == sorted(
        c.lower() for c in sdf.columns
    ), f"{name}: column mismatch {odf.columns} vs {sdf.columns}"
    oracle_rows = odf.to_dict("records")
    assert len(spark_rows) == len(oracle_rows), f"{name}: row count"
    a = _norm(spark_rows, sdf.columns)
    b = _norm(oracle_rows, sdf.columns)
    assert a == b, (name, a[:5], b[:5])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"p", "value"}


def test_bad_sf_dir_fails_cleanly(spark):
    """A wrong sf_dir must raise Spark's PATH_NOT_FOUND analysis error,
    not something torn from mid-pipeline."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    q = entry_mod.queries()["qdigest_quantiles_exact"]
    with pytest.raises(AnalysisException):
        q(spark, "/root/testdata/sf_does_not_exist").collect()


def test_two_queries_share_one_session(spark, sf_test):
    """_ensure_importable ships the package zip once per SparkContext;
    a second query on the same session must not re-add or fail."""
    qs = entry_mod.queries()
    n1 = qs["doc_fingerprints"](spark, sf_test).count()
    n2 = qs["token_count_by_lang"](spark, sf_test).count()
    assert n1 > 0 and n2 > 0
