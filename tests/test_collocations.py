"""PMI collocation operator: integer-exact scoring, shared tokenizer."""

from pyspark.sql import functions as F


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_bigrams_exact_small(spark):
    """3 copies of 'strong coffee' inside filler: c_xy=3, verify the
    exact integer ratio against a hand computation."""
    from q_digest_spark.operators.collocations import pmi_bigrams

    texts = ["strong coffee now", "strong coffee", "a strong coffee a a"]
    out = {
        (r["x"], r["y"]): (r["c_xy"], r["pmi_ratio_milli"])
        for r in pmi_bigrams(_df(spark, texts), "text", "doc_id", min_count=3)
        .collect()
    }
    # unigrams: strong 3, coffee 3, now 1, a 3 -> N_u = 10
    # bigrams: N_b = 7 ('strong coffee' x3, 'coffee now', 'a strong',
    #   'coffee a', 'a a')
    # ratio = 1000 * 3 * 10^2 / (7 * 3 * 3) = 300000/63 = 4761.9 -> 4761
    assert out[("strong", "coffee")] == (3, 4761)
    assert ("a", "a") not in out  # c_xy = 1 < min_count


def test_pmi_bigrams_min_count_and_casefold(spark):
    """Tokenizer is the shared normalizer: case-folded, whitespace
    collapsed — 'Strong  COFFEE' counts with 'strong coffee'."""
    from q_digest_spark.operators.collocations import pmi_bigrams

    texts = ["Strong  COFFEE", "strong\tcoffee", "strong coffee"]
    out = pmi_bigrams(_df(spark, texts), "text", "doc_id", min_count=3)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["c_xy"] == 3
    # all 6 unigrams are strong/coffee (3 each), N_u=6, N_b=3:
    # ratio = 1000 * 3 * 36 / (3 * 3 * 3) = 4000
    assert rows[0]["pmi_ratio_milli"] == 4000


def test_pmi_bigrams_schema_nullfree(spark):
    from q_digest_spark.operators.collocations import pmi_bigrams

    texts = ["x y " * 10]
    out = pmi_bigrams(_df(spark, texts), "text", "doc_id", min_count=2)
    pdf = out.toPandas()
    assert list(pdf.columns) == ["x", "y", "c_xy", "pmi_ratio_milli"]
    assert not pdf.isnull().any().any()
