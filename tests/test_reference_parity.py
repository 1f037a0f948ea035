"""Parity against the REFERENCE'S OWN test run.

tests/golden/reference_test_output.txt is the captured stdout of the
compiled reference suite (gcc -O2 -DTESTALL, this sandbox; see
/root/reference/serial-implementation/src/test.c, n=2,000,000, K=20).
Each line is "<p>th percentile: <exact> v/s <reference estimate>".

Asserted here, on the SAME deterministic input streams:

1. our generators reproduce the reference's exact percentiles
   value-for-value (so the streams really are identical);
2. our Q-Digest estimate satisfies the published eps*n rank bound
   against the reference's own exact values;
3. our estimate is at least as accurate as the reference's printed
   estimate at every p (aggregate rank error) — "matches the
   reference's results" in the only sense compression order allows
   (SURVEY.md §5: bound-satisfaction, not bit-equality, is the
   cross-implementation contract; the reference itself is not
   deterministic across merge orders).

The uniform ("random") section uses C rand() and is not reproducible
from numpy; its exact values still document the reference's observed
~2.4% p50 rank error (BASELINE.md), which bounds what we must beat.
"""

import os
import re

import numpy as np
import pytest

from q_digest_spark.sketches import QDigest, universe_bits_for
from tests.test_sketches import geometric, triangular_ramp

N = 2_000_000
K = 20
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_test_output.txt")


def _parse_golden():
    sections = {}
    cur = None
    for line in open(GOLDEN):
        m = re.match(r"<< (\w+) >>", line)
        if m:
            cur = m.group(1)
            sections[cur] = []
            continue
        m = re.match(r"(\d+)th percentile: (\d+) v/s (\d+)", line)
        if m and cur:
            sections[cur].append(
                (int(m.group(1)) / 100, int(m.group(2)), int(m.group(3)))
            )
    return sections


@pytest.fixture(scope="module")
def golden():
    return _parse_golden()


def _rank_err(sorted_vals, estimate, p):
    lo = np.searchsorted(sorted_vals, estimate, "left")
    hi = np.searchsorted(sorted_vals, estimate, "right")
    t = p * len(sorted_vals)
    return 0.0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t)) / len(sorted_vals)


@pytest.mark.parametrize(
    "section,gen",
    [("test_poisson_distribution", triangular_ramp), ("test_geometric_distribution", geometric)],
)
def test_parity_with_reference_run(golden, section, gen):
    rows = golden[section]
    assert rows, "golden file missing section"
    vals = gen(N)
    s = np.sort(vals)
    # 1) identical input stream: our exact == reference's exact at the
    #    reference's own index convention, a->data[(int)(p*n - 1)]
    for p, ref_exact, _ in rows:
        assert s[int(p * N) - 1] == ref_exact, (section, p)

    # the reference shuffles before inserting (test.c:77 shuffle(b));
    # mirror that protocol (numpy seed, C rand not reproducible)
    shuffled = vals.copy()
    np.random.RandomState(0).shuffle(shuffled)
    q = QDigest(K, universe_bits_for(int(vals.max())))
    for chunk in np.array_split(shuffled, 16):
        q.update_batch(chunk)
    eps = q.error_bound()

    ours_total, refs_total = 0.0, 0.0
    for p, ref_exact, ref_est in rows:
        est = q.percentile(p)
        e_ours = _rank_err(s, est, p)
        assert e_ours <= eps, (section, p, est, ref_exact)
        ours_total += e_ours
        refs_total += _rank_err(s, ref_est, p)
    # 3) aggregate accuracy at least matches the reference's own run
    assert ours_total <= refs_total + 1e-9, (ours_total, refs_total)

    # worst case: generation-ordered (sorted-ish) ingestion still
    # satisfies the published bound at every p
    q2 = QDigest(K, universe_bits_for(int(vals.max())))
    for chunk in np.array_split(vals, 16):
        q2.update_batch(chunk)
    for p, _, _ in rows:
        assert _rank_err(s, q2.percentile(p), p) <= eps


def test_reference_uniform_error_is_documented_baseline(golden):
    """The golden uniform section pins the reference's observed error
    (BASELINE.md: ~2.4% at p50); recompute it from the file so the
    baseline number is traceable."""
    rows = golden["test_random_distribution"]
    p50 = [r for r in rows if abs(r[0] - 0.5) < 1e-9][0]
    _, exact, est = p50
    assert exact == 999904 and est == 1048575
    # our uniform test (different stream, same distribution family)
    rng = np.random.RandomState(377)
    vals = rng.randint(0, N, N)
    s = np.sort(vals)
    q = QDigest(K, universe_bits_for(int(vals.max())))
    q.update_batch(vals)
    ours = _rank_err(s, q.percentile(0.5), 0.5)
    ref_err = abs(np.searchsorted(s, est) - 0.5 * N) / N  # ~2.4%
    assert ours <= max(ref_err, q.error_bound())
