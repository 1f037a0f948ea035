"""Frequent Directions matrix sketch: the PSD + delta_sum + worst-case
guarantees on correlated data, under every partition merge order
(the STATE is order-sensitive like KLL/t-digest; the BOUND must hold
for all orders), serialization round-trip, and the Spark
sketch_aggregate path against the distributed exact Gram.
"""

import functools
import itertools

import numpy as np
import pytest

from q_digest_spark.sketches.fd import FrequentDirections

N, D = 12_000, 48
PARTS = 4


def _data(seed=0):
    rng = np.random.default_rng(seed)
    low = rng.normal(size=(N, 4)) @ rng.normal(size=(4, D)) * 3.0
    return low + rng.normal(size=(N, D)) * 0.5


def _check_bounds(sk, G):
    eigs = np.linalg.eigvalsh(G - sk.gram())
    tol = 1e-9 * sk.frob2
    assert eigs.min() >= -tol, "difference not PSD"
    assert abs(eigs).max() <= sk.delta_sum + tol, "cert violated"
    assert sk.delta_sum <= sk.worst_case_bound() + tol, "worst-case violated"


def test_bound_single_pass():
    A = _data()
    sk = FrequentDirections(32)
    for lo in range(0, N, 997):
        sk.update_batch(A[lo:lo + 997])
    assert sk.n == N
    assert abs(sk.frob2 - float(np.sum(A * A))) < 1e-6 * sk.frob2
    _check_bounds(sk, A.T @ A)


def test_bound_under_all_merge_orders():
    A = _data(seed=5)
    parts = np.array_split(A, PARTS)
    sks = []
    for p in parts:
        s = FrequentDirections(16)
        s.update_batch(p)
        sks.append(s)
    G = A.T @ A
    for perm in itertools.permutations(range(PARTS)):
        m = functools.reduce(
            lambda a, b: a.merge(b),
            [FrequentDirections.from_bytes(sks[i].to_bytes()) for i in perm],
        )
        assert m.n == N
        _check_bounds(m, G)


def test_roundtrip_and_guards():
    A = _data(seed=9)[:500]
    sk = FrequentDirections(16)
    sk.update_batch(A)
    rt = FrequentDirections.from_bytes(sk.to_bytes())
    assert np.allclose(rt.gram(), sk.gram())
    assert (rt.n, rt.delta_sum, rt.frob2) == (sk.n, sk.delta_sum, sk.frob2)
    with pytest.raises(ValueError):
        sk.update_batch(np.zeros((2, D + 1)))
    with pytest.raises(ValueError):
        sk.merge(FrequentDirections(32))
    with pytest.raises(ValueError):
        FrequentDirections(15)  # odd ell
    empty = FrequentDirections(16)
    rt2 = FrequentDirections.from_bytes(empty.to_bytes())
    assert rt2.n == 0 and rt2.d is None


def test_spark_fd_matches_exact_gram(spark):
    import pandas as pd

    from q_digest_spark.operators.matrix import exact_gram, fd_of

    A = _data(seed=13)[:4000]
    pdf = pd.DataFrame({"v": [row.astype(np.float64) for row in A]})
    sdf = spark.createDataFrame(pdf).repartition(6)

    sk = fd_of(sdf, "v", ell=32)
    G = exact_gram(sdf, "v")
    assert np.allclose(G, A.T @ A, rtol=1e-10)
    assert sk.n == len(A)
    _check_bounds(sk, G)
