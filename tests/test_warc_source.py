"""WARC / JSONL ingestion round-trips into the canonical pages table:
byte-identical html + extracted text per url."""

import base64
import json
import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

from q_digest_spark.sources.warc import (
    pages_to_warc,
    read_pages_jsonl,
    read_pages_warc,
    read_pages_warc_gz,
)
from q_digest_spark.sources.webpages import generate_pdf


def _fixture_pdf(n=120):
    pdf = generate_pdf(np.arange(n))
    return pdf


def test_warc_roundtrip_byte_identical(spark):
    pdf = _fixture_pdf()
    d = tempfile.mkdtemp(prefix="qds_warc_")
    # two files -> two+ input splits
    for i, part in enumerate(np.array_split(np.arange(len(pdf)), 2)):
        with open(os.path.join(d, f"part{i}.warc"), "wb") as f:
            f.write(pages_to_warc(pdf.iloc[part]))
    got = read_pages_warc(spark, d).toPandas().set_index("url").sort_index()
    want = pdf.set_index("url").sort_index()
    assert len(got) == len(want)
    assert all(bytes(g) == bytes(w) for g, w in zip(got["html"], want["html"]))
    assert (got["text"] == want["text"]).all()  # extractor invariant holds
    assert (got["lang"] == want["lang"]).all()  # header lang wins
    # timestamps survive at second precision (WARC-Date format)
    assert (
        got["warc_ts"].dt.floor("s") == want["warc_ts"].dt.floor("s")
    ).all()


def test_warc_gz_roundtrip_byte_identical(spark):
    """Gzipped WARC (the real Common Crawl shape): three .warc.gz
    files, one written as concatenated per-record gzip members (the
    CC layout), parallel across files; html must round-trip
    byte-identical and the extractor invariant must hold."""
    import gzip

    pdf = _fixture_pdf(90)
    d = tempfile.mkdtemp(prefix="qds_warcgz_")
    parts = np.array_split(np.arange(len(pdf)), 3)
    for i, part in enumerate(parts[:2]):
        with open(os.path.join(d, f"part{i}.warc.gz"), "wb") as f:
            f.write(gzip.compress(pages_to_warc(pdf.iloc[part])))
    # per-record gzip members, concatenated — Common Crawl's layout
    with open(os.path.join(d, "part2.warc.gz"), "wb") as f:
        for j in parts[2]:
            f.write(gzip.compress(pages_to_warc(pdf.iloc[[j]])))
    got = read_pages_warc_gz(spark, d).toPandas().set_index("url").sort_index()
    want = pdf.set_index("url").sort_index()
    assert len(got) == len(want)
    assert all(bytes(g) == bytes(w) for g, w in zip(got["html"], want["html"]))
    assert (got["text"] == want["text"]).all()
    assert (got["lang"] == want["lang"]).all()
    assert (got["warc_ts"].dt.floor("s") == want["warc_ts"].dt.floor("s")).all()


def test_jsonl_roundtrip_and_corrupt_line_tolerance(spark):
    pdf = _fixture_pdf(60)
    d = tempfile.mkdtemp(prefix="qds_jsonl_")
    path = os.path.join(d, "pages.jsonl")
    with open(path, "w") as f:
        for r in pdf.itertuples(index=False):
            f.write(json.dumps({
                "url": r.url,
                "warc_ts": r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "html_b64": base64.b64encode(bytes(r.html)).decode(),
                "lang": r.lang,
            }) + "\n")
        f.write("{this is not json\n")  # poison line must be dropped
    got = read_pages_jsonl(spark, path).toPandas().set_index("url").sort_index()
    want = pdf.set_index("url").sort_index()
    assert len(got) == len(want)
    assert all(bytes(g) == bytes(w) for g, w in zip(got["html"], want["html"]))
    assert (got["text"] == want["text"]).all()


def test_warc_lang_id_fallback(spark):
    """Records without the content-language header fall back to the
    stopword lang_id."""
    pdf = _fixture_pdf(40).drop(columns=["lang"]).assign(lang=None)
    pdf2 = pdf.drop(columns=["lang"])  # serializer emits no lang header
    d = tempfile.mkdtemp(prefix="qds_warcnl_")
    with open(os.path.join(d, "p.warc"), "wb") as f:
        f.write(pages_to_warc(pdf2))
    got = read_pages_warc(spark, d)
    n_known = got.where(F.col("lang").isNotNull()).count()
    assert n_known == len(pdf2)  # lang_id always yields a label ('other' ok)


def test_warc_duplicate_header_first_occurrence_wins(spark):
    """Documented semantics of the vectorized parser: a (malformed)
    record carrying a header twice uses the FIRST occurrence."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://first.example/\r\n"
        b"WARC-Target-URI: http://second.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 11\r\n"
        b"\r\n"
        b"<p>hi</p>\r\n\r\n"
    )
    d = tempfile.mkdtemp(prefix="qds_warcdup_")
    try:
        with open(os.path.join(d, "p.warc"), "wb") as f:
            f.write(rec)
        rows = read_pages_warc(spark, d).collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "http://first.example/"
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
