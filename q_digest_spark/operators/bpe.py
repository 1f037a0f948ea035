"""Distributed BPE merge training (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 —
public methodology; also Gage 1994).

The key scale observation: BPE training never needs the corpus after
ONE aggregation — it runs on the WORD-FREQUENCY table (vocabulary),
which is orders of magnitude smaller than a web corpus (Heaps' law).
So the corpus-sized work is a single tokenize+groupBy; every merge
round then operates on vocab-sized data: count adjacent symbol pairs
weighted by word frequency (JVM array algebra — transform over index
sequences, no Python), pick the global argmax (a 1-row orderBy/limit
— TakeOrderedAndProject), and apply the merge as a plain string
replace.

Symbol encoding — the part that makes greedy merging a single
engine-portable replace(): symbols are joined by TWO spaces and the
word padded with two spaces each side ('  a  b  c  '). Merging pair
(a, b) is then replace(w, ' a  b ', ' ab '): the pattern consumes one
space from each flanking boundary and the replacement restores it, so
consecutive merge sites do NOT share consumed characters — one
non-overlapping left-to-right replace() pass merges 'a a a a' to
'aa aa' exactly like the reference implementation's
(?<!\\S)a b(?!\\S) regex, without lookaround (which RE2-based engines
lack). A symbol can never match partially: every symbol occurrence is
flanked by spaces on both sides, and symbols contain none.

Determinism: merge choice tie-breaks (count desc, left asc, right
asc) — a total order, so the learned merge table is engine-bit-
identical. Words are restricted to [a-z0-9]+ so replace() semantics
are metacharacter-free everywhere.

Divergences from tokenizer-package BPE, documented: no end-of-word
marker and no byte fallback — this is the merge-LEARNING operator;
the encoder side is functions/text.py's tokenizers. Pair counting
counts all adjacent occurrences (the Sennrich convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spill import cleanup_spill, spill_parquet


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): corpus word frequencies over lowercase [a-z0-9]+
    whitespace tokens, each word rendered as the double-space symbol
    string '  c  h  a  r  s  '. The ONLY corpus-sized pass of BPE
    training."""
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t")
    ).where(F.col("t").rlike("^[a-z0-9]+$"))
    return toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).select(
        F.concat(
            F.lit("  "),
            F.array_join(
                F.filter(F.split(F.col("t"), ""), lambda c: c != ""), "  "
            ),
            F.lit("  "),
        ).alias("w"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, c): adjacent symbol-pair counts weighted by word
    frequency — all occurrences counted."""
    arr = F.split(F.trim(F.col("w")), "  ")
    pairs = F.transform(
        F.sequence(F.lit(2), F.size(arr)),
        lambda i: F.struct(
            F.element_at(arr, i - 1).alias("l"),
            F.element_at(arr, i).alias("r"),
        ),
    )
    return (
        vocab.where(F.size(arr) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def train_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> list[tuple[int, str, str, int]]:
    """[(merge_rank, left, right, pair_count)]: the first ``n_merges``
    BPE merges learned from the corpus. Per round the vocab table is
    spilled (lineage never accumulates — the pagerank/CC pattern);
    only the single winning pair ever reaches the driver."""
    vocab = spill_parquet(word_frequencies(df, text_col), "qds_bpe_vocab_")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        new_vocab = spill_parquet(
            vocab.select(
                F.expr(
                    "replace(w, ' {l}  {r} ', ' {lr} ')".format(
                        l=l, r=r, lr=l + r
                    )
                ).alias("w"),
                "cnt",
            ),
            "qds_bpe_vocab_",
        )
        cleanup_spill(vocab)
        vocab = new_vocab
    cleanup_spill(vocab)
    return merges


def _symbol_counts(vocab: DataFrame) -> DataFrame:
    """(s, sc): corpus frequency of each current symbol."""
    arr = F.split(F.trim(F.col("w")), "  ")
    return (
        vocab.select(F.explode(arr).alias("s"), "cnt")
        .groupBy("s")
        .agg(F.sum("cnt").cast("long").alias("sc"))
    )


def train_wordpiece_merges(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> list[tuple[int, str, str, int]]:
    """[(merge_rank, left, right, score_q)]: WordPiece-style merge
    learning (Schuster & Nakajima, "Japanese and Korean Voice Search",
    ICASSP 2012; the likelihood-gain criterion popularized by BERT):
    the merge maximizes pair_count / (left_count * right_count)
    rather than raw pair count — preferring pairs that explain their
    parts, not just frequent ones.

    The argmax key is quantized integer-exactly as
    score_q = (10^12 * c_ab) div (c_a * c_b) with (l, r) tie-break, so
    the learned table is engine-bit-identical (a quantization tie is
    broken the same way everywhere; exact-rational argmax could differ
    at such ties — documented divergence, bounded by 1e-12 relative).
    Same scale shape as train_bpe_merges plus one vocab-sized symbol
    count and two broadcast joins per round."""
    vocab = spill_parquet(word_frequencies(df, text_col), "qds_wp_vocab_")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc = _pair_counts(vocab)
        sc = _symbol_counts(vocab)
        scored = (
            pc.join(F.broadcast(sc.select(F.col("s").alias("l"),
                                          F.col("sc").alias("cl"))), "l")
            .join(F.broadcast(sc.select(F.col("s").alias("r"),
                                        F.col("sc").alias("cr"))), "r")
            .withColumn(
                "score_q",
                F.expr("CAST((1000000000000 * c) div (cl * cr) AS BIGINT)"),
            )
        )
        best = (
            scored.orderBy(
                F.col("score_q").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, q = best[0]["l"], best[0]["r"], int(best[0]["score_q"])
        merges.append((rank, l, r, q))
        new_vocab = spill_parquet(
            vocab.select(
                F.expr(
                    "replace(w, ' {l}  {r} ', ' {lr} ')".format(
                        l=l, r=r, lr=l + r
                    )
                ).alias("w"),
                "cnt",
            ),
            "qds_wp_vocab_",
        )
        cleanup_spill(vocab)
        vocab = new_vocab
    cleanup_spill(vocab)
    return merges
