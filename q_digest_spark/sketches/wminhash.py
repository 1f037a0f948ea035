"""Weighted MinHash (ICWS — Ioffe, "Improved Consistent Weighted
Sampling", ICDM 2010) for WEIGHTED-Jaccard near-duplicate detection.

Plain MinHash treats a document as a SET of shingles; two documents
with the same vocabulary but wildly different term frequencies
(boilerplate spam repeating one phrase 100x vs a page using it once)
hash identically. ICWS samples (token, t) pairs such that two weight
vectors collide with probability exactly

    J_w(a, b) = sum_k min(a_k, b_k) / sum_k max(a_k, b_k)

the weighted Jaccard — the dedup similarity CCNet/RefinedWeb-style
pipelines actually want for frequency-sensitive near-dup.

Determinism: all per-(token, permutation) randomness is counter-based
— splitmix64 mixes of (token_hash, perm_index, salt) — so a signature
is a pure function of the token-count vector. Identical documents get
identical signatures on every executor of every run (no RNG state,
no seed plumbing), which is what makes LSH recall 1.0 a THEOREM for
exact duplicates rather than a probability.

Math per permutation i and token k with weight w_k > 0 (Ioffe Alg. 1):
    r ~ Gamma(2,1), c ~ Gamma(2,1), beta ~ U(0,1)
    t_k   = floor(ln w_k / r + beta)
    ln y  = r * (t_k - beta)
    ln a  = ln c - ln y - r
    winner k* = argmin_k ln a;  sample is (k*, t_{k*})
Gamma(2,1) = -ln(u1 * u2) from two uniforms. Collision probability of
the (k*, t) pair equals J_w exactly (Ioffe 2010, Thm. 1); we fold the
pair into one 64-bit value, adding only a 2^-64 hash-collision term.

Vectorization: each document computes an (m_tokens, n_perm) float64
grid in one shot (6 numpy ops + argmin); the Python loop is over
documents in the Arrow batch only, never over tokens or permutations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import hash_strings, splitmix64

U64 = np.uint64
_INV53 = 2.0 ** -53


def _uniforms(token_hashes: np.ndarray, perm: np.ndarray, salt: int) -> np.ndarray:
    """(m, n_perm) uniforms in (0, 1), a pure function of
    (token_hash, perm_index, salt)."""
    with np.errstate(over="ignore"):
        x = splitmix64(
            token_hashes[:, None] ^ splitmix64(perm[None, :] ^ U64(salt))
        )
    # top 53 bits -> (0,1); +2^-54 keeps log() finite at x == 0
    return (x >> U64(11)).astype(np.float64) * _INV53 + 2.0 ** -54


def icws_signature(
    token_hashes: np.ndarray,
    weights: np.ndarray,
    n_perm: int = 64,
    seed: int = 0x1CE5,
) -> np.ndarray:
    """One document's ICWS signature: (n_perm,) uint64. Tokens with
    non-positive weight are dropped; an empty document gets a fixed
    sentinel signature (so two empty docs compare equal, J_w = 1 by
    convention)."""
    keep = weights > 0
    token_hashes = np.ascontiguousarray(token_hashes[keep], dtype=U64)
    weights = np.ascontiguousarray(weights[keep], dtype=np.float64)
    perm = np.arange(n_perm, dtype=U64)
    if len(token_hashes) == 0:
        return splitmix64(perm ^ U64(seed + 0xE))
    u1 = _uniforms(token_hashes, perm, seed + 1)
    u2 = _uniforms(token_hashes, perm, seed + 2)
    u3 = _uniforms(token_hashes, perm, seed + 3)
    u4 = _uniforms(token_hashes, perm, seed + 4)
    beta = _uniforms(token_hashes, perm, seed + 5)
    r = -np.log(u1) - np.log(u2)                  # Gamma(2,1)
    ln_c = np.log(-np.log(u3) - np.log(u4))       # ln Gamma(2,1)
    ln_w = np.log(weights)[:, None]
    t = np.floor(ln_w / r + beta)
    ln_y = r * (t - beta)
    ln_a = ln_c - ln_y - r
    k = np.argmin(ln_a, axis=0)
    cols = np.arange(n_perm)
    tk = t[k, cols].astype(np.int64).view(U64)
    with np.errstate(over="ignore"):
        return splitmix64(token_hashes[k] ^ splitmix64(tk ^ U64(seed + 7)))


def token_counts(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(token_hashes, counts) of the lowercase whitespace tokens —
    the weight vector ICWS samples from."""
    if not text:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.float64)
    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.float64)
    h = hash_strings(pd.Series(toks))
    uh, counts = np.unique(h, return_counts=True)
    return uh, counts.astype(np.float64)


def _icws_segments(
    token_hashes: np.ndarray,
    weights: np.ndarray,
    starts: np.ndarray,
    seg_lens: np.ndarray,
    n_perm: int,
    seed: int,
) -> np.ndarray:
    """ICWS signatures for many documents at once: tokens of all docs
    concatenated into one (M, n_perm) grid, winners per document via
    segmented reductions. Bit-identical to icws_signature per doc —
    every grid cell is a pure function of (token_hash, perm, seed), so
    concatenation changes nothing, and the masked-min-row-index winner
    equals np.argmin's first-minimum rule."""
    perm = np.arange(n_perm, dtype=U64)
    u1 = _uniforms(token_hashes, perm, seed + 1)
    u2 = _uniforms(token_hashes, perm, seed + 2)
    r = -np.log(u1) - np.log(u2)
    del u1, u2
    u3 = _uniforms(token_hashes, perm, seed + 3)
    u4 = _uniforms(token_hashes, perm, seed + 4)
    ln_c = np.log(-np.log(u3) - np.log(u4))
    del u3, u4
    beta = _uniforms(token_hashes, perm, seed + 5)
    ln_w = np.log(weights)[:, None]
    t = np.floor(ln_w / r + beta)
    ln_a = ln_c - r * (t - beta) - r
    del ln_c, beta
    mn = np.minimum.reduceat(ln_a, starts, axis=0)
    rows = np.where(
        ln_a == np.repeat(mn, seg_lens, axis=0),
        np.arange(len(token_hashes), dtype=np.int64)[:, None],
        len(token_hashes),
    )
    win = np.minimum.reduceat(rows, starts, axis=0)
    cols = np.arange(n_perm)
    tk = t[win, cols[None, :]].astype(np.int64).view(U64)
    with np.errstate(over="ignore"):
        return splitmix64(token_hashes[win] ^ splitmix64(tk ^ U64(seed + 7)))


def wminhash_batch(
    texts: pd.Series,
    n_perm: int = 64,
    seed: int = 0x1CE5,
    chunk_tokens: int = 1 << 16,
) -> np.ndarray:
    """(n_docs, n_perm) uint64 ICWS signatures for a batch of texts.

    Docs are packed into chunks of <= chunk_tokens total tokens and
    signed via one segmented grid per chunk — the numpy call count is
    per CHUNK, not per doc, which matters on short web documents
    (tokenize-only Python loop remains). chunk_tokens bounds peak grid
    memory at ~4 * chunk_tokens * n_perm * 8 bytes per worker."""
    n = len(texts)
    out = np.empty((n, n_perm), dtype=U64)
    if n == 0:
        return out
    sentinel = splitmix64(np.arange(n_perm, dtype=U64) ^ U64(seed + 0xE))
    hs: list = [None] * n
    ws: list = [None] * n
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        h, w = token_counts(t if isinstance(t, str) else None)
        keep = w > 0
        if not keep.all():
            h, w = h[keep], w[keep]
        hs[i], ws[i], lens[i] = h, w, len(h)
        if lens[i] == 0:
            out[i] = sentinel
    i = 0
    while i < n:
        j, tot, idxs = i, 0, []
        while j < n and (not idxs or tot + lens[j] <= chunk_tokens):
            if lens[j] > 0:
                idxs.append(j)
                tot += lens[j]
            j += 1
        if idxs:
            ii = np.asarray(idxs)
            th = np.ascontiguousarray(np.concatenate([hs[k] for k in idxs]), dtype=U64)
            tw = np.ascontiguousarray(
                np.concatenate([ws[k] for k in idxs]), dtype=np.float64
            )
            seg_lens = lens[ii]
            starts = np.zeros(len(ii), dtype=np.int64)
            starts[1:] = np.cumsum(seg_lens)[:-1]
            out[ii] = _icws_segments(th, tw, starts, seg_lens, n_perm, seed)
        i = j
    return out


def exact_weighted_jaccard(text_a: str, text_b: str) -> float:
    """Local oracle: sum(min)/sum(max) over token counts."""
    ha, wa = token_counts(text_a)
    hb, wb = token_counts(text_b)
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    all_h = np.union1d(ha, hb)
    va = np.zeros(len(all_h))
    vb = np.zeros(len(all_h))
    va[np.searchsorted(all_h, ha)] = wa
    vb[np.searchsorted(all_h, hb)] = wb
    return float(np.minimum(va, vb).sum() / np.maximum(va, vb).sum())
