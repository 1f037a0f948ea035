"""Repetition quality stats and URL canonicalization
(functions/text.py): local oracles + dialect-parity spot checks.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from q_digest_spark.functions.text import (
    URL_TRACKING_PARAMS,
    canonical_url,
    line_repetition_stats,
    repetition_flags,
)


def test_line_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a\nb\na\n\n  \na"),      # lines a,b,a,a
            (2, "x\ny\nz"),
            (3, "only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_lines"], r["n_distinct_lines"], r["top_line_n"])
        for r in line_repetition_stats(df, "text", "doc_id").collect()
    }
    assert got == {1: (4, 2, 3), 2: (3, 3, 1), 3: (1, 1, 1)}


def test_repetition_flags(spark):
    df = spark.createDataFrame(
        [(1, "a\na\na\na\nb"), (2, "a\nb\nc\nd")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["keep"] for r in repetition_flags(df, "text", "doc_id", 0.3).collect()}
    # doc1: 5 lines, 2 distinct -> dup frac 3/5 = 0.6 > 0.3 -> drop
    assert got == {1: False, 2: True}


@pytest.mark.parametrize(
    "raw,want",
    [
        ("HTTPS://Example.COM/Path/?utm_source=x", "https://example.com/Path"),
        ("http://a.b/p?q=1&utm_medium=m&r=2#frag", "http://a.b/p?q=1&r=2"),
        ("http://a.b/p?utm_source=1&utm_campaign=2", "http://a.b/p"),
        ("http://a.b/deep/path/", "http://a.b/deep/path"),
        ("http://a.b/", "http://a.b/"),
        ("http://a.b/p?gclid=abc", "http://a.b/p"),
        ("http://a.b/p?keep=1", "http://a.b/p?keep=1"),
        # the standard utm triple: three CONSECUTIVE tracking params
        ("http://a.b/p?utm_source=a&utm_medium=b&utm_campaign=c", "http://a.b/p"),
        ("http://a.b/p?utm_source=a&keep=1&utm_medium=b", "http://a.b/p?keep=1"),
    ],
)
def test_canonical_url_cases(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(canonical_url("url").alias("c"))
        .collect()[0]["c"]
    )
    assert got == want, (raw, got, want)


def test_canonical_url_duckdb_parity(spark):
    """The documented SQL mirror (same regex sequence, RE2 'g' +
    backslash backrefs) must produce byte-identical output."""
    urls = [
        "HTTPS://Example.COM/Path/?utm_source=x",
        "http://a.b/p?q=1&utm_medium=m&r=2#frag",
        "http://a.b/p?utm_source=1&utm_campaign=2",
        "http://a.b/deep/path/",
        "http://a.b/p?keep=1&fbclid=zzz",
        "http://a.b/?ref=tw",
        "http://a.b/p?utm_source=a&utm_medium=b&utm_campaign=c&x=1",
    ]
    alt = "|".join(URL_TRACKING_PARAMS)
    con = duckdb.connect()
    duck = [
        con.execute(
            f"""
            SELECT regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             lower(regexp_extract(?, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
                               regexp_replace(?, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                             '#.*$', ''),
                           '([?&])(?:(?:{alt})=[^&#]*&)+', '\\1', 'g'),
                         '[?&](?:{alt})=[^&#]*$', ''),
                       '\\?$', ''),
                     '(://[^/]+/.+)/$', '\\1')
            """,
            [u, u],
        ).fetchone()[0]
        for u in urls
    ]
    got = [
        r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(canonical_url("url").alias("c"))
        .collect()
    ]
    assert got == duck, list(zip(urls, got, duck))


def test_canonical_url_randomized_duckdb_parity(spark):
    """Seeded random URL generator (hosts, paths, mixed tracking and
    non-tracking params, fragments, trailing slashes) — Spark and the
    documented DuckDB mirror must agree byte-for-byte on every one."""
    import random

    rng = random.Random(99)
    parts = list(URL_TRACKING_PARAMS) + ["q", "id", "page", "x"]
    urls = []
    for _ in range(150):
        scheme = rng.choice(["http", "HTTPS", "https"])
        host = rng.choice(["Example.com", "a.b.c", "X.Y", "site.ORG"])
        path = "/".join(rng.choice(["p", "Dir", "x9", ""]) for _ in range(rng.randint(0, 3)))
        url = f"{scheme}://{host}/{path}"
        if rng.random() < 0.7:
            n = rng.randint(1, 4)
            q = "&".join(
                f"{rng.choice(parts)}={rng.randint(0, 99)}" for _ in range(n)
            )
            url += "?" + q
        if rng.random() < 0.3:
            url += "#frag" + str(rng.randint(0, 9))
        if rng.random() < 0.3:
            url += "/"
        urls.append(url)

    import duckdb

    alt = "|".join(URL_TRACKING_PARAMS)
    con = duckdb.connect()
    duck = [
        con.execute(
            f"""
            SELECT regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             lower(regexp_extract(?, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
                               regexp_replace(?, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                             '#.*$', ''),
                           '([?&])(?:(?:{alt})=[^&#]*&)+', '\\1', 'g'),
                         '[?&](?:{alt})=[^&#]*$', ''),
                       '\\?$', ''),
                     '(://[^/]+/.+)/$', '\\1')
            """,
            [u, u],
        ).fetchone()[0]
        for u in urls
    ]
    got = [
        r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(canonical_url("url").alias("c"))
        .collect()
    ]
    mismatches = [(u, g, d) for u, g, d in zip(urls, got, duck) if g != d]
    assert not mismatches, mismatches[:5]
