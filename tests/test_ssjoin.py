"""Exact prefix-filtered set-similarity join (operators/ssjoin.py)."""

import itertools

import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.ssjoin import jaccard_self_join


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-ssjoin")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _brute(texts, ppt):
    sets = {i: set(t.lower().split()) for i, t in texts}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        i = len(sa & sb)
        u = len(sa) + len(sb) - i
        if u and 1000 * i >= ppt * u:
            out[(a, b)] = 1000 * i // u
    return out


def _run(spark, texts, ppt):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    return {
        (r["id_a"], r["id_b"]): r["jacc_ppt"]
        for r in jaccard_self_join(df, "text", "doc_id", ppt).collect()
    }


def test_lossless_vs_bruteforce_random_corpus(spark):
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        (i, " ".join(rng.sample(vocab, rng.randint(5, 20))))
        for i in range(40)
    ]
    # clones with one-token perturbations: guaranteed high-J pairs
    texts += [(100 + i, t + " extra") for i, t in texts[:10]]
    for ppt in (700, 900):
        assert _run(spark, texts, ppt) == _brute(texts, ppt), ppt


def test_threshold_boundary_integer_exact(spark):
    # J = 9/10 exactly: passes at 900, fails at 901
    a = " ".join(f"t{i}" for i in range(9))
    texts = [(1, a), (2, a + " t9")]
    assert _run(spark, texts, 900) == {(1, 2): 900}
    assert _run(spark, texts, 901) == {}


def test_duplicate_tokens_are_set_semantics(spark):
    texts = [(1, "a b c a a"), (2, "c b a")]
    assert _run(spark, texts, 900) == {(1, 2): 1000}
