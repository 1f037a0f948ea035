"""Containment self-join + host template tokens: planted quotes,
asymmetry, block isolation, and a pure-Python oracle."""

import pytest

from q_digest_spark.operators.ssjoin import containment_self_join
from q_digest_spark.operators.tfidf import host_template_tokens


@pytest.fixture(scope="module")
def quote_df(spark):
    # doc 1 is fully quoted inside doc 2 (low Jaccard: 4/12 tokens),
    # doc 3 shares nothing, doc 4 == doc 1 but in another host
    rows = [
        (1, "alpha beta gamma delta", "h1"),
        (2, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8", "h1"),
        (3, "zeta eta theta", "h1"),
        (4, "alpha beta gamma delta", "h2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_quote_detected_asymmetric(spark, quote_df):
    got = {
        (r["id_a"], r["id_b"]): r["cont_ppt"]
        for r in containment_self_join(quote_df, "text", "doc_id", 950).collect()
    }
    assert got[(1, 2)] == 1000  # doc 1 fully inside doc 2
    assert (2, 1) not in got  # doc 2 NOT inside doc 1 (4/12 tokens)
    assert got[(1, 4)] == 1000 and got[(4, 1)] == 1000  # identical sets
    assert not any(3 in pair for pair in got)


def test_block_col_isolates_hosts(spark, quote_df):
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_self_join(
            quote_df, "text", "doc_id", 950, block_col="src"
        ).collect()
    }
    assert (1, 2) in got
    assert (1, 4) not in got and (4, 1) not in got  # cross-host blocked


def test_jaccard_misses_what_containment_finds(spark, quote_df):
    from q_digest_spark.operators.ssjoin import jaccard_self_join

    jac = {
        (r["id_a"], r["id_b"])
        for r in jaccard_self_join(quote_df, "text", "doc_id", 900).collect()
    }
    assert (1, 2) not in jac and (2, 1) not in jac


def test_host_template_tokens_python_oracle(spark):
    rows = [
        (1, "nav home about menu cat", "h1"),
        (2, "nav home about menu dog", "h1"),
        (3, "nav home about menu owl", "h1"),
        (4, "nav home fox owl cat", "h1"),
        (5, "something else entirely here", "h2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = {
        (r["source"], r["term"]): (r["df_host"], r["n_docs"], r["ppm"])
        for r in host_template_tokens(df, "src", "doc_id", "text", 750_000).collect()
    }
    # h1: nav/home in 4/4 docs; about/menu in 3/4 (750000 ppm boundary)
    assert got[("h1", "nav")] == (4, 4, 1_000_000)
    assert got[("h1", "home")] == (4, 4, 1_000_000)
    assert got[("h1", "about")] == (3, 4, 750_000)
    assert got[("h1", "menu")] == (3, 4, 750_000)
    assert ("h1", "cat") not in got  # 2/4 docs
    # h2: single doc -> every token is 100%
    assert got[("h2", "something")] == (1, 1, 1_000_000)
