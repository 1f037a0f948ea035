"""Distributed BPE merge training (operators/bpe.py)."""

import collections
import re

import pytest
from pyspark.sql import SparkSession

from q_digest_spark.operators.bpe import train_bpe_merges


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-bpe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _reference_bpe(texts, n_merges):
    """Sennrich-style reference: vocab of space-joined symbols, pair
    counts over all adjacent occurrences, greedy merge via the
    lookaround regex — the semantics the double-space replace must
    reproduce exactly."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch(r"[a-z0-9]+", w):
                vocab[" ".join(w)] += 1
    merges = []
    vocab = dict(vocab)
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for w, c in vocab.items():
            syms = w.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, c))
        pat = re.compile(
            r"(?<!\S)" + re.escape(l) + r" " + re.escape(r) + r"(?!\S)"
        )
        vocab = {
            pat.sub(l + r, w): c for w, c in vocab.items()
        }
    return merges


def test_matches_reference_bpe_including_overlap_runs(spark):
    texts = [
        "low lower lowest low low",
        "aaaa aaa aa aaaaa",          # overlap-run stress: merges (a,a)
        "newer newest new news",
        "wider wide widest",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe_merges(df, "text", n_merges=6)
    assert got == _reference_bpe(texts, 6)


def test_nonalpha_words_excluded_and_short_vocab_stops(spark):
    df = spark.createDataFrame([("ab ab a-b 42x !!",)], "text string")
    got = train_bpe_merges(df, "text", n_merges=10)
    # 'ab' (x2), '42x' are eligible; '!!' and 'a-b' are not
    assert got[0][1:3] == ("a", "b")
    assert len(got) <= 10 and all(c >= 1 for *_, c in got)


def test_wordpiece_matches_reference(spark):
    from q_digest_spark.operators.bpe import train_wordpiece_merges

    texts = ["queue quit quiz aqua", "in win input inn", "big fig bin"] * 2
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_wordpiece_merges(df, "text", n_merges=4)

    # reference with the same integer-quantized score
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch(r"[a-z0-9]+", w):
                vocab[" ".join(w)] += 1
    vocab = dict(vocab)
    want = []
    for rank in range(1, 5):
        pairs = collections.Counter()
        syms = collections.Counter()
        for w, c in vocab.items():
            ss = w.split()
            for s in ss:
                syms[s] += c
            for i in range(len(ss) - 1):
                pairs[(ss[i], ss[i + 1])] += c
        scored = {
            (l, r): (10**12 * c) // (syms[l] * syms[r])
            for (l, r), c in pairs.items()
        }
        (l, r), q = min(
            scored.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, l, r, q))
        pat = re.compile(
            r"(?<!\S)" + re.escape(l) + r" " + re.escape(r) + r"(?!\S)"
        )
        vocab = {pat.sub(l + r, w): c for w, c in vocab.items()}
    assert got == want
