"""Streaming per-key Misra-Gries heavy hitters (applyInPandasWithState):
the drained state must honor MG's batching-invariant pigeonhole
guarantee — every token with true count > n/(K+1) is a candidate, and
every candidate estimate is a lower bound."""

import uuid

from pyspark.sql import functions as F


def test_streaming_heavy_guarantee(spark, sf_unit):
    from q_digest_spark.streaming.stateful import grouped_streaming_heavy

    K = 16
    schema = spark.read.parquet(f"{sf_unit}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_unit)
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    out = grouped_streaming_heavy(stream, "lang", "tok", k=K)
    name = "t_shh_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name).toPandas()
    final = {}
    for key, grp in emitted.groupby("key"):
        last = grp[grp["n"] == grp["n"].max()]
        final[key] = dict(zip(last["item"], last["est"]))

    toks = (
        spark.read.parquet(f"{sf_unit}/documents.parquet")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    exact = {
        (r["lang"], r["tok"]): r["c"]
        for r in toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    totals = {}
    for (lang, _), c in exact.items():
        totals[lang] = totals.get(lang, 0) + c
    assert final, "stream emitted nothing"
    for (lang, tok), c in exact.items():
        if c * (K + 1) > totals[lang]:
            assert tok in final[lang], (lang, tok, c)
    for lang, cands in final.items():
        for tok, est in cands.items():
            true = exact.get((lang, tok), 0)
            assert est <= true <= est + totals[lang] // (K + 1), (
                lang,
                tok,
                est,
                true,
            )
