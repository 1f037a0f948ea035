"""Exact maximal-span dedup (duplicate_maximal_spans_exact) vs an
independent all-pairs suffix-LCP brute force, plus the planted
one-sided divergence against the run-chaining approximation."""

import pytest

from q_digest_spark.operators.contamination import (
    duplicate_maximal_spans,
    duplicate_maximal_spans_exact,
)


def brute_spans(corpus: dict, k: int) -> dict:
    """Independent ground truth for Lee'22 semantics: mark the FULL
    pairwise suffix-LCP extent of every pair of corpus positions
    whose common prefix is >= k tokens (this enumerates every
    duplicated substring of every length >= k, not just k-grams),
    then read maximal covered islands per document. O(T^2 * k) —
    test-sized corpora only."""
    suf = [
        (d, i) for d, toks in corpus.items() for i in range(len(toks))
    ]
    cov = {d: [False] * len(t) for d, t in corpus.items()}
    for a in range(len(suf)):
        da, ia = suf[a]
        sa = corpus[da][ia:]
        for b in range(a + 1, len(suf)):
            db, ib = suf[b]
            sb = corpus[db][ib:]
            l = 0
            while l < min(len(sa), len(sb)) and sa[l] == sb[l]:
                l += 1
            if l >= k:
                for j in range(ia, ia + l):
                    cov[da][j] = True
                for j in range(ib, ib + l):
                    cov[db][j] = True
    out = {}
    for d, flags in cov.items():
        spans, s = [], None
        for j, c in enumerate(flags):
            if c and s is None:
                s = j
            if not c and s is not None:
                spans.append((s + 1, j - s))
                s = None
        if s is not None:
            spans.append((s + 1, len(flags) - s))
        out[d] = sorted(spans)
    return out


def _run_exact(spark, corpus: dict, k: int) -> dict:
    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {}
    rows = duplicate_maximal_spans_exact(
        df, "text", "doc_id", min_tokens=k
    ).collect()
    for r in rows:
        got.setdefault(r["id"], []).append((r["span_start"], r["span_tokens"]))
    return {d: sorted(v) for d, v in got.items()}


def test_exact_cross_doc_verbatim_span(spark):
    shared = [f"s{i}" for i in range(30)]
    corpus = {
        1: [f"a{i}" for i in range(10)] + shared + [f"b{i}" for i in range(5)],
        2: [f"c{i}" for i in range(3)] + shared + [f"d{i}" for i in range(8)],
        3: [f"e{i}" for i in range(40)],
    }
    got = _run_exact(spark, corpus, k=20)
    assert got == {1: [(11, 30)], 2: [(4, 30)]}
    assert got == {d: s for d, s in brute_spans(corpus, 20).items() if s}


def test_exact_periodic_self_overlap(spark):
    """A once-written periodic run duplicates itself through
    overlapping occurrences (internal period < k) — suffix-array
    semantics count it, and so must the exact operator."""
    corpus = {
        1: [f"u{i}" for i in range(6)] + ["w"] * 40 + [f"v{i}" for i in range(6)],
        2: [f"x{i}" for i in range(30)],
    }
    got = _run_exact(spark, corpus, k=20)
    assert got == {1: [(7, 40)]}
    assert got == {d: s for d, s in brute_spans(corpus, 20).items() if s}


def test_exact_rejects_chained_windows_approx_reports(spark):
    """THE divergence the approximation documents: 27 partner docs
    each duplicate a different 4-token piece of doc 0, so every
    4-window of doc 0 is duplicated and run-chaining assembles a
    30-token 'span' — but no 20-token substring of doc 0 occurs
    twice, so the exact answer for doc 0 is EMPTY."""
    x = [f"x{i}" for i in range(30)]
    corpus = {0: x}
    for i in range(27):
        corpus[100 + i] = (
            [f"l{i}_{j}" for j in range(4)]
            + x[i : i + 4]
            + [f"r{i}_{j}" for j in range(4)]
        )
    df_rows = [(d, " ".join(t)) for d, t in corpus.items()]
    df = spark.createDataFrame(df_rows, "doc_id long, text string")
    approx = duplicate_maximal_spans(
        df, "text", "doc_id", n=4, min_tokens=20
    ).collect()
    assert any(r["id"] == 0 and r["span_tokens"] >= 20 for r in approx)
    exact = _run_exact(spark, corpus, k=20)
    assert 0 not in exact
    assert brute_spans(corpus, 20)[0] == []


def test_exact_touching_regions_merge_and_gaps_split(spark):
    """Two duplicated 20-token regions separated by one unique token
    stay two spans; back-to-back regions merge into one island."""
    r1 = [f"p{i}" for i in range(20)]
    r2 = [f"q{i}" for i in range(20)]
    corpus = {
        1: r1 + ["gaptok"] + r2,          # gap -> two spans
        2: r1 + r2,                        # touching -> one span
        3: [f"f{i}" for i in range(5)] + r1 + [f"g{i}" for i in range(5)],
        4: [f"h{i}" for i in range(5)] + r2 + [f"i{i}" for i in range(5)],
    }
    got = _run_exact(spark, corpus, k=20)
    assert got[1] == [(1, 20), (22, 20)]
    assert got[2] == [(1, 40)]
    want = brute_spans(corpus, 20)
    assert got == {d: s for d, s in want.items() if s}


@pytest.mark.parametrize("seed", [11, 23])
def test_exact_matches_bruteforce_random_planted(spark, seed):
    """Randomized corpora with planted repeats of assorted lengths and
    overlaps: the operator must equal the independent all-pairs-LCP
    ground truth exactly."""
    import random

    rng = random.Random(seed)
    k = 8
    vocab = [f"v{i}" for i in range(12)]  # small vocab -> chance repeats
    corpus = {}
    for d in range(6):
        corpus[d] = [rng.choice(vocab) for _ in range(rng.randint(15, 45))]
    # plant one verbatim cross-doc repeat of random length >= k
    src = corpus[0]
    ln = rng.randint(k, min(20, len(src)))
    st = rng.randint(0, len(src) - ln)
    piece = src[st : st + ln]
    corpus[5] = corpus[5][:5] + piece + corpus[5][5:]
    got = _run_exact(spark, corpus, k=k)
    want = {d: s for d, s in brute_spans(corpus, k).items() if s}
    assert got == want
