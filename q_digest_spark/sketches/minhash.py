"""MinHash signatures + SimHash fingerprints for near-duplicate
detection over document text.

No counterpart in the reference repo; part of the training-data
pipeline operator set. All computation is batch-vectorized numpy over
pandas Series (shingling uses a single pass per document with numpy
rolling hashes, not Python substring loops).

MinHash (Broder 1997): signature[j] = min over the doc's shingle
hashes re-mixed with seed j. P(sig_a[j] == sig_b[j]) = Jaccard(a, b).
LSH banding: split the r-long signature into b bands of w rows
(r = b*w); docs sharing any band bucket are candidates. Collision
probability 1 - (1 - s^w)^b (s = true Jaccard).

SimHash (Charikar 2002): 64-bit fingerprint = sign of the
token-hash-weighted bit-sum; hamming distance tracks cosine
similarity of the bag-of-tokens vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import hash_strings, seeded_rehash_matrix, splitmix64

U64 = np.uint64


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct rolling k-gram hashes of one document (numpy rolling
    polynomial hash over utf-8 bytes, then splitmix64-finalized)."""
    if text is None:
        return np.empty(0, dtype=U64)
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(U64)
    if len(b) < k:
        return splitmix64(b) if len(b) else np.empty(0, dtype=U64)
    base = U64(1099511628211)  # FNV prime as the rolling base
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=U64)
        powers[0] = 1
        for i in range(1, k):
            powers[i] = powers[i - 1] * base
        # windows matrix via strided view
        n_win = len(b) - k + 1
        idx = np.arange(k)[None, :] + np.arange(n_win)[:, None]
        h = (b[idx] * powers[None, ::-1]).sum(axis=1)
    return np.unique(splitmix64(h))


def word_token_hashes(text: str) -> np.ndarray:
    if not text:
        return np.empty(0, dtype=U64)
    toks = pd.Series(text.lower().split())
    if toks.empty:
        return np.empty(0, dtype=U64)
    return hash_strings(toks)


def minhash_signature(shingles: np.ndarray, n_perm: int = 128) -> np.ndarray:
    """(n_perm,) uint64 signature; all-max sentinel for empty docs."""
    if len(shingles) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=U64)
    return seeded_rehash_matrix(shingles, n_perm).min(axis=0)


def minhash_batch(texts: pd.Series, n_perm: int = 128, shingle_k: int = 5) -> np.ndarray:
    """(len(texts), n_perm) signature matrix for a batch."""
    out = np.empty((len(texts), n_perm), dtype=U64)
    for i, t in enumerate(texts):
        out[i] = minhash_signature(char_shingle_hashes(t, shingle_k), n_perm)
    return out


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) bucket keys: hash each band's rows together."""
    n_docs, n_perm = sig.shape
    w = n_perm // bands
    assert bands * w == n_perm, "bands must divide n_perm"
    with np.errstate(over="ignore"):
        acc = np.zeros((n_docs, bands), dtype=U64)
        for j in range(w):
            acc = splitmix64(acc ^ sig[:, j::w][:, :bands])
        # mix the band index in so band i buckets never collide with band j
        acc ^= splitmix64(np.arange(bands, dtype=np.int64).view(U64))[None, :]
    return acc


def signature_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def exact_jaccard(text_a: str, text_b: str, shingle_k: int = 5) -> float:
    sa = char_shingle_hashes(text_a, shingle_k)
    sb = char_shingle_hashes(text_b, shingle_k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def simhash64(texts: pd.Series) -> np.ndarray:
    """(len(texts),) int64 simhash fingerprints (vectorized bit-count
    accumulation per batch)."""
    out = np.zeros(len(texts), dtype=np.int64)
    bitcols = (U64(1) << np.arange(64, dtype=U64))[None, :]
    for i, t in enumerate(texts):
        th = word_token_hashes(t)
        if len(th) == 0:
            continue
        bits = (th[:, None] & bitcols) != 0  # (n_tok, 64)
        score = bits.sum(axis=0) * 2 - len(th)  # (+1/-1 sum)
        set_bits = bitcols[0][score > 0]
        fp = np.bitwise_or.reduce(set_bits) if len(set_bits) else U64(0)
        out[i] = int(np.array([fp], dtype=U64).view(np.int64)[0])
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.int64).view(U64)) ^ (np.asarray(b, dtype=np.int64).view(U64))
    cnt = np.zeros(len(x) if x.ndim else 1, dtype=np.int64)
    x = np.atleast_1d(x)
    for _ in range(64):
        cnt += (x & U64(1)).astype(np.int64)
        x = x >> U64(1)
    return cnt
