"""rollup_sketch_rows: one scan, coarser levels = merges of finer
sketches — bit-identical to building each level directly (HLL state
is element-wise max, so merge order cannot matter)."""

from pyspark.sql import functions as F

from q_digest_spark.operators.aggregate import grouped_sketch_rows, rollup_sketch_rows
from q_digest_spark.operators.quantiles import RawHLL, raw_hll_from_bytes


def test_rollup_levels_match_direct_builds(spark, sf_test):
    df = spark.read.parquet(f"{sf_test}/documents.parquet")
    rolled = rollup_sketch_rows(
        df, ["lang", "source"], "doc_id", RawHLL, raw_hll_from_bytes
    ).collect()
    by_level = {}
    for r in rolled:
        by_level.setdefault(r["level"], {})[(r["lang"], r["source"])] = r

    # level 2 == plain grouped build
    direct2 = {
        (r["lang"], r["source"]): r
        for r in grouped_sketch_rows(
            df, ["lang", "source"], "doc_id", RawHLL, raw_hll_from_bytes
        ).collect()
    }
    assert set(by_level[2]) == set(direct2)

    # level 1 (source rolled up): bytes identical to a direct per-lang build
    direct1 = {
        r["lang"]: bytes(r["sketch"])
        for r in grouped_sketch_rows(df, ["lang"], "doc_id", RawHLL, raw_hll_from_bytes).collect()
    }
    got1 = {k[0]: bytes(r["sketch"]) for k, r in by_level[1].items()}
    assert got1 == direct1

    # level 0 (grand total): single row, estimate within bound of exact
    assert len(by_level[0]) == 1
    total = next(iter(by_level[0].values()))
    exact = df.select(F.countDistinct("doc_id")).collect()[0][0]
    est = raw_hll_from_bytes(bytes(total["sketch"])).estimate()
    assert abs(est - exact) <= 3 * 1.04 / (16384**0.5) * max(exact, 1)
    assert total["rows"] == df.where(F.col("doc_id").isNotNull()).count()
