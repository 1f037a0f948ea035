"""k-anonymity risk profile, Zipf-exponent fit, and label-centroid
cosine pairs — unit + engine-safety guards for the three governance/
distribution-shape queries.

The Zipf guard is disk-derived (every sf dir under /root/testdata is
re-checked automatically, same pattern as the kcore unroll guard):
the query quantizes ln(rank) and ln(count) to integers at 1e4 in BOTH
engines, which is hash-stable only while no ln value sits within
cross-libm ulp distance of a rounding boundary. Cross-libm ln error
is ~1 ulp (~2e-12 in quantized units here); we assert a margin of
1e-6 — four orders of magnitude of slack — for every quantized term
at every scale factor on disk.
"""

import glob
import math

import pytest

from tests.conftest import SF_UNIT

TOKENIZE_SQL = """
WITH d AS (SELECT lang, text FROM read_parquet('{p}') WHERE text IS NOT NULL),
t AS (SELECT lang, unnest(string_split(trim(regexp_replace(lower(text),
           '[ \t\n\r\f]+', ' ', 'g')), ' ')) AS term FROM d),
c AS (SELECT lang, term, count(*) AS c FROM t WHERE term <> '' GROUP BY 1, 2),
rk AS (SELECT lang, c,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY c DESC, term ASC) AS rank
       FROM c)
SELECT rank, c FROM rk WHERE rank <= 64
"""


def test_kanonymity_profile_classes_and_ppm(spark):
    from q_digest_spark.operators.privacy import kanonymity_profile

    # 1 unique row, one group of 3, one group of 6, one group of 25,
    # plus a NULL-QI row that must be excluded from groups AND total.
    rows = (
        [("u", 1)]
        + [("a", 1)] * 3
        + [("b", 2)] * 6
        + [("c", 3)] * 25
        + [(None, 9)]
    )
    df = spark.createDataFrame(rows, "g string, h long")
    out = {
        r["qi_class"]: (r["n_groups"], r["n_rows"], r["rows_ppm"])
        for r in kanonymity_profile(df, ["g", "h"]).collect()
    }
    assert set(out) == {"k_eq_1", "k_2_4", "k_5_19", "k_ge_20"}
    tot = 35
    assert out["k_eq_1"] == (1, 1, (2 * 10**6 * 1 + tot) // (2 * tot))
    assert out["k_2_4"] == (1, 3, (2 * 10**6 * 3 + tot) // (2 * tot))
    assert out["k_5_19"] == (1, 6, (2 * 10**6 * 6 + tot) // (2 * tot))
    assert out["k_ge_20"] == (1, 25, (2 * 10**6 * 25 + tot) // (2 * tot))


def test_kanonymity_profile_zero_fill(spark):
    from q_digest_spark.operators.privacy import kanonymity_profile

    df = spark.createDataFrame([("x",)] * 30, "g string")
    out = {
        r["qi_class"]: (r["n_groups"], r["n_rows"], r["rows_ppm"])
        for r in kanonymity_profile(df, ["g"]).collect()
    }
    assert out["k_ge_20"] == (1, 30, 10**6)
    for cls in ("k_eq_1", "k_2_4", "k_5_19"):
        assert out[cls] == (0, 0, 0)


def test_zipf_ln_quantization_margins_all_sf_dirs():
    """Every quantized ln term of zipf_exponent_by_lang, at every
    scale factor on disk, must sit far from its 1e4 rounding
    boundary (engine-portability of floor(ln*1e4 + 0.5))."""
    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "no documents fixtures found under /root/testdata"
    worst = 1.0
    for p in paths:
        for rank, c in duckdb.sql(TOKENIZE_SQL.format(p=p)).fetchall():
            for v in (math.log(rank), math.log(c)):
                if v == 0.0:
                    # ln(1) is exactly 0.0 in every IEEE libm; the
                    # resulting floor(0.5) = 0 carries no ulp risk.
                    continue
                frac = (v * 10_000 + 0.5) % 1.0
                worst = min(worst, abs(frac - 0.5))
    assert worst > 1e-6, f"ln quantization margin too tight: {worst}"


def test_label_centroid_pairs_python_parity(spark):
    """q_label_centroid_cos_pairs == an independent pure-Python
    replay (pyarrow read, exact ints) at sf0.001."""
    import pyarrow.parquet as pq

    from __spark_entry__ import q_label_centroid_cos_pairs

    t = pq.read_table(f"{SF_UNIT}/embeddings.parquet")
    cents: dict[int, list[int]] = {}
    for label, emb in zip(
        t.column("label").to_pylist(), t.column("embedding").to_pylist()
    ):
        if label is None or emb is None:
            continue
        q = [math.floor(float(v) * 1_000 + 0.5) for v in emb]
        acc = cents.setdefault(int(label), [0] * len(q))
        for i, v in enumerate(q):
            acc[i] += v
    want = {}
    for la in sorted(cents):
        for lb in sorted(cents):
            if lb <= la:
                continue
            a, b = cents[la], cents[lb]
            dot = sum(x * y for x, y in zip(a, b))
            n1, n2 = sum(x * x for x in a), sum(y * y for y in b)
            if n1 == 0 or n2 == 0:
                want[(la, lb)] = (0, 0)
            else:
                sign = 1 if dot > 0 else (-1 if dot < 0 else 0)
                want[(la, lb)] = (
                    sign,
                    (2 * 10**6 * dot * dot + n1 * n2) // (2 * n1 * n2),
                )

    got = {
        (r["label_a"], r["label_b"]): (r["cos_sign"], r["cos_sq_ppm"])
        for r in q_label_centroid_cos_pairs(spark, SF_UNIT).collect()
    }
    assert got == want
    assert all(0 <= s <= 10**6 for _, s in got.values())


def test_zipf_exponent_is_negative_and_strong(spark):
    """The fitted Zipf slope must be negative and non-trivial for
    every language — the query's meaningfulness contract (a flat or
    positive slope would flag a broken rank/count wiring long before
    the oracle hash would). The synthetic sf0.001 vocabulary is tiny
    (~31 types/lang) with a near-flat head, so only the sign and a
    loose magnitude are pinned, not the fit strength."""
    from __spark_entry__ import q_zipf_exponent_by_lang

    for r in q_zipf_exponent_by_lang(spark, SF_UNIT).collect():
        assert r["corr_sign"] == -1, r
        assert r["zipf_slope_ppm"] < -100_000, r
        assert 0 < r["corr_sq_ppm"] <= 10**6, r


MARKOV_ENTROPY_SQL = """
WITH s AS (SELECT event_type AS src,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS dst
           FROM read_parquet('{p}')
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
tc AS (SELECT src, dst, count(*) AS n FROM s WHERE dst IS NOT NULL
       GROUP BY 1, 2)
SELECT src, (ln(sum(n)) - sum(n * ln(n)) / sum(n)) * 10000 AS v
FROM tc GROUP BY src
"""


def test_markov_entropy_quantization_margins_all_sf_dirs():
    """markov_entropy_rate quantizes H(dst|src) at 1e-4 nats; every
    quantized value at every scale factor on disk must sit far from
    its rounding boundary (same disk-derived guard pattern as the
    zipf ln margins; measured margins 0.02-0.46 quantized units vs
    ~1e-8 cross-libm noise)."""
    import duckdb

    paths = sorted(glob.glob("/root/testdata/sf*/events.parquet"))
    assert paths, "no events fixtures found under /root/testdata"
    worst = 1.0
    for p in paths:
        for _src, v in duckdb.sql(MARKOV_ENTROPY_SQL.format(p=p)).fetchall():
            frac = (v + 0.5) % 1.0
            worst = min(worst, abs(frac - 0.5))
    assert worst > 1e-4, f"entropy quantization margin too tight: {worst}"
