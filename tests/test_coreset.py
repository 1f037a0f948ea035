"""Greedy k-center selection (operators/coreset.py) — pure-Python
parity, the Gonzalez non-increasing radius property, and shape
edges."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT


def _greedy_kcenter_python(vecs: dict[int, list[int]], k: int):
    """Independent exact-int replay of the operator's contract."""
    picked = []
    seed = min(vecs)
    picked.append((1, seed, 0))
    mind = {
        i: sum((a - b) * (a - b) for a, b in zip(v, vecs[seed]))
        for i, v in vecs.items()
    }
    for rank in range(2, k + 1):
        nxt = max(mind, key=lambda i: (mind[i], -i))
        picked.append((rank, nxt, mind[nxt]))
        if rank == k:
            break
        for i, v in vecs.items():
            d = sum((a - b) * (a - b) for a, b in zip(v, vecs[nxt]))
            if d < mind[i]:
                mind[i] = d
    return picked


def test_kcenter_python_parity_sf_unit(spark):
    import pyarrow.parquet as pq

    from q_digest_spark.operators.coreset import kcenter_select

    t = pq.read_table(f"{SF_UNIT}/embeddings.parquet")
    vecs = {
        int(i): [math.floor(float(v) * 1_000 + 0.5) for v in e]
        for i, e in zip(
            t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
        )
        if i is not None and e is not None
    }
    want = _greedy_kcenter_python(vecs, 8)

    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    got = [
        (r["sel_rank"], r["vec_id"], r["dist_sq"])
        for r in kcenter_select(emb, "vec_id", "embedding", k=8)
        .orderBy("sel_rank")
        .collect()
    ]
    assert got == want

    # Gonzalez property: the selection-time radii are non-increasing
    # after the seed, and all centers are distinct.
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)
    assert len({i for _, i, _ in got}) == len(got)


def test_kcenter_fewer_rows_than_k(spark):
    from q_digest_spark.operators.coreset import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    out = (
        kcenter_select(df, "vec_id", "embedding", k=10)
        .orderBy("sel_rank")
        .collect()
    )
    assert [(r["sel_rank"], r["vec_id"]) for r in out] == [
        (1, 1),
        (2, 3),
        (3, 2),
    ]
    assert [r["dist_sq"] for r in out] == [0, 3_000_000 * 3, 1_000_000]


def test_kcenter_null_rows_excluded(spark):
    from q_digest_spark.operators.coreset import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0]), (None, [9.0]), (3, None), (4, [5.0])],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_select(df, "vec_id", "embedding", k=2).collect()
    assert {r["vec_id"] for r in out} == {1, 4}
    assert all(r["dist_sq"] is not None for r in out)
