"""Deterministic synthetic Common-Crawl-style web-pages table.

BASELINE.json input_hint fixes the engine's primary input shape:
``(url string, warc_ts timestamp, html binary, text string, lang
string)``. The reference repo has no such table (its inputs are
synthetic int arrays); this generator is the FIXTURES.md §2 recipe:

- fully distributed: ``spark.range(n)`` + one ``mapInPandas`` pass;
  every column is a pure function of (row_id, seed=42), so any
  partitioning / ordering yields identical content;
- domains ~ Zipf(s=1.2) over 1,000 synthetic hosts (heavy-hitter
  fixture for Count-Min); urls unique except a deliberate ~2%
  duplicate-url rate (HLL fixture: countDistinct(url) != count(*));
- html is a deterministic template with nav/script boilerplate, so
  extract_text has real work to do; text = extract_text(html) —
  byte-identical per url by construction (golden SHA-256 pinned in
  tests);
- lang drawn over {en de it fr es pt zh other} with fixed weights,
  with lang-matching stopwords woven into the body so lang_id has
  signal;
- warc_ts spread over a 30-day window from 2025-01-01 (partition
  pruning fixture).

At the 100 TB design point the same code runs unchanged: n_rows scales,
``mapInPandas`` stays one pass, and nothing ever collects to the
driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
N_DOMAINS = 1000
ZIPF_S = 1.2
LANGS = ["en", "de", "it", "fr", "es", "pt", "zh", "other"]
LANG_W = np.array([0.40, 0.12, 0.08, 0.10, 0.12, 0.06, 0.07, 0.05])

_LANG_FILLER = {
    "en": "the quick brown fox jumps over the lazy dog and that is of interest to the reader in every way",
    "de": "der schnelle braune fuchs springt und das ist nicht ohne grund ein beispiel mit vielen worten von heute",
    "it": "il veloce cane marrone salta che la volpe per una strada e sono con il vento non del tutto",
    "fr": "le renard brun rapide saute dans les bois et la lune est une merveille pour que nous avec",
    "es": "el zorro marron rapido salta sobre el perro que una luna por la noche con para las estrellas es",
    "pt": "o rapido cachorro marrom pula sobre que uma lua para brilhar com os ventos das noites mais por",
    "zh": "快速的棕色狐狸跳过懒狗 月亮在夜空中闪耀 风吹过树林 这是一个测试句子",
    "other": "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore",
}

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _domain_cdf() -> np.ndarray:
    ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64)
    w = ranks ** (-ZIPF_S)
    return np.cumsum(w / w.sum())


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per row id."""
    from ..sketches.hashing import splitmix64

    h = splitmix64(ids.astype(np.int64).view(np.uint64) ^ np.uint64(SEED * 0x9E37 + salt))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_pdf(ids: np.ndarray) -> pd.DataFrame:
    """All five columns for a batch of row ids — pure numpy/pandas."""
    ids = np.asarray(ids, dtype=np.int64)
    cdf = _domain_cdf()

    # ~2% duplicate urls: rows with id % 50 == 49 reuse the previous
    # row's identity (same url AND same html -> byte-identical text).
    eff = np.where(ids % 50 == 49, ids - 1, ids)
    eff_dom = np.searchsorted(cdf, _u01(eff, 1))
    lang_idx = np.minimum(
        np.searchsorted(np.cumsum(LANG_W), _u01(eff, 2)), len(LANGS) - 1
    )
    n_paras = (1 + _u01(eff, 3) * 6).astype(np.int64)

    urls, htmls, langs_out, ts = [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    # hash-spread timestamps across the full 30-day window (row ids are
    # dense, so `e % window` alone would pile everything into hour one)
    ts_off = (_u01(eff, 4) * 30 * 86400).astype(np.int64)
    from ..functions.text import extract_text_series

    path_hashes = [hashlib.sha1(f"{SEED}:{e}".encode()).hexdigest()[:16] for e in eff]
    for i in range(len(ids)):
        e = int(eff[i])
        d = int(eff_dom[i])
        lang = LANGS[int(lang_idx[i])]
        filler = _LANG_FILLER[lang]
        paras = "".join(
            f"<p>Paragraph {j} of page {e}. {filler} token{(e * 7 + j * 13) % 9973}.</p>"
            for j in range(int(n_paras[i]))
        )
        title = f"Page {e} from domain {d}"
        html = (
            f"<html><head><title>{title}</title>"
            f"<script>var x = {e};</script>"
            f"<style>.nav {{ color: red; }}</style></head>"
            f"<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
            f"<!-- boilerplate {e} -->"
            f"<h1>{title}</h1>{paras}"
            f"<footer>&copy; 2025 domain{d}</footer></body></html>"
        )
        urls.append(f"https://domain{d}.example.com/{path_hashes[i]}")
        htmls.append(html.encode("utf-8"))
        langs_out.append(lang)
        ts.append(base_ts + np.timedelta64(int(ts_off[i]), "s"))
    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts, dtype="datetime64[us]"),
            "html": htmls,
            "lang": langs_out,
        }
    )
    pdf["text"] = extract_text_series(pd.Series(htmls, dtype=object))
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


def generate_webpages(spark: SparkSession, n_rows: int, n_partitions: int = 32) -> DataFrame:
    """Distributed deterministic generation: content depends only on
    row id, never on partitioning."""

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield generate_pdf(pdf["id"].to_numpy())

    return spark.range(0, n_rows, 1, n_partitions).mapInPandas(gen, SCHEMA)
