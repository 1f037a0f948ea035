"""Reciprocal-rank fusion (RRF) of top-k retrieval lists — the
standard hybrid-search combiner (Cormack, Clarke & Buettcher,
"Reciprocal Rank Fusion outperforms Condorcet and individual Rank
Learning Methods", SIGIR 2009 — public literature).

RRF(d) = sum over lists L of 1 / (c + rank_L(d)), with d absent from a
list contributing 0. Fusing FULL rankings would need a global rank per
retriever — a total sort of the corpus per signal, the classic scale
smell. Production hybrid search fuses the TOP-K of each retriever
instead: each list is a distributed top-k (Spark plans orderBy().
limit(k) as TakeOrderedAndProject — per-partition heaps plus one
driver merge of k rows, no global sort), rank assignment then runs on
<= k rows (a single-partition window over k rows, not over the
corpus), and the fusion groupBy touches at most lists * k rows.

Scores are integer-quantized — floor(quant / (c + rank)) — so the
fused ordering is bit-identical in any engine (RRF in floats can tie
two docs at the last ulp and let libm pick the winner).

No reference counterpart: the C reference has no retrieval layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_ranks(
    df: DataFrame, id_col: str, order_by: list, k: int
) -> DataFrame:
    """(id, rank 1..k): the top ``k`` rows of ``df`` under
    ``order_by`` (must be a total order for determinism). The limit
    plans as TakeOrderedAndProject; the rank window only ever sees the
    surviving k rows."""
    top = df.orderBy(*order_by).limit(k)
    w = Window.orderBy(*order_by)
    return top.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    c: int = 60,
    quant: int = 1_000_000_000,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse (id, rank) lists: (id, <name>_rank ... , rrf_q) with
    rrf_q = sum of floor(quant / (c + rank)) over lists containing the
    id (missing list => rank NULL, contribution 0). ``top_n`` keeps
    the best fused rows by (rrf_q desc, id asc)."""
    scored = None
    for name, r in ranked.items():
        part = r.select(
            "id",
            F.col("rank").alias(f"{name}_rank"),
            F.expr(f"CAST({quant} div ({c} + rank) AS BIGINT)").alias(
                f"__s_{name}"
            ),
        )
        scored = part if scored is None else scored.join(part, "id", "full_outer")
    out = scored.withColumn(
        "rrf_q",
        sum(
            F.coalesce(F.col(f"__s_{n}"), F.lit(0)) for n in ranked
        ).cast("long"),
    ).drop(*[f"__s_{n}" for n in ranked])
    if top_n is not None:
        out = out.orderBy(F.col("rrf_q").desc(), F.col("id").asc()).limit(top_n)
    return out
