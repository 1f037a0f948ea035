"""hash_sample / hash_split: determinism, rate accuracy, disjoint
exhaustive splits, salt independence."""

from pyspark.sql import functions as F

from q_digest_spark.operators.sampling import hash_sample, hash_split


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(0, 50_000).select(F.col("id"))
    a = hash_sample(df, "id", 0.25)
    n1, n2 = a.count(), hash_sample(df, "id", 0.25).count()
    assert n1 == n2  # pure function of key
    assert abs(n1 / 50_000 - 0.25) < 0.01
    # nested rates: a 0.1 sample is a subset of the 0.25 sample
    small = hash_sample(df, "id", 0.10)
    assert small.join(a, "id", "left_anti").count() == 0


def test_hash_sample_salt_independence(spark):
    df = spark.range(0, 50_000)
    a = set(r["id"] for r in hash_sample(df, "id", 0.2, salt="a").collect())
    b = set(r["id"] for r in hash_sample(df, "id", 0.2, salt="b").collect())
    overlap = len(a & b) / 50_000
    assert abs(overlap - 0.04) < 0.01  # ~rate^2 for independent samples


def test_hash_split_disjoint_exhaustive(spark):
    df = spark.range(0, 30_000)
    tr, va, te = hash_split(df, "id", [0.8, 0.1, 0.1])
    n = [s.count() for s in (tr, va, te)]
    assert sum(n) == 30_000
    assert tr.join(va, "id", "inner").count() == 0
    assert va.join(te, "id", "inner").count() == 0
    assert abs(n[0] / 30_000 - 0.8) < 0.01


def test_hash_sample_full_rate_is_identity(spark):
    df = spark.range(0, 10_000)
    assert hash_sample(df, "id", 1.0).count() == 10_000


def test_bottomk_sample_exact_size_deterministic_and_heap_planned(spark, sf_test):
    from q_digest_spark.operators.sampling import bottomk_sample

    docs = spark.read.parquet(f"{sf_test}/documents.parquet")
    s1 = bottomk_sample(docs, "doc_id", 50)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert len(ids1) == 50
    # deterministic under re-partitioning
    ids2 = sorted(
        r["doc_id"] for r in bottomk_sample(docs.repartition(13), "doc_id", 50).collect()
    )
    assert ids1 == ids2
    # the physical plan is a per-partition top-k, not a global sort
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # k > n degrades to the full table
    assert bottomk_sample(docs.limit(7), "doc_id", 100).count() == 7
