"""Greedy max-coverage selection (operators/coverage.py) —
pure-Python greedy parity, tie-breaks, early stop, null exclusion."""


def _greedy_python(pairs: set[tuple[str, str]], k: int):
    sets: dict[str, set[str]] = {}
    for s, e in pairs:
        sets.setdefault(s, set()).add(e)
    covered: set[str] = set()
    out, cum = [], 0
    for rank in range(1, k + 1):
        best = None
        for s, es in sorted(sets.items()):
            gain = len(es - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (s, gain)
        if best is None:
            break
        cum += best[1]
        out.append((rank, best[0], best[1], cum))
        covered |= sets[best[0]]
    return out


def test_greedy_max_coverage_parity_and_ties(spark):
    from q_digest_spark.operators.coverage import greedy_max_coverage

    pairs = {
        ("a", "1"), ("a", "2"), ("a", "3"),
        ("b", "3"), ("b", "4"), ("b", "5"),
        ("c", "1"), ("c", "2"),
        # d ties with b on first-round gain 3: tie-break picks 'b'
        ("d", "6"), ("d", "7"), ("d", "8"),
    }
    df = spark.createDataFrame(sorted(pairs), "s string, e string")
    got = [
        tuple(r)
        for r in greedy_max_coverage(df, "s", "e", k=4)
        .orderBy("sel_rank")
        .collect()
    ]
    assert got == _greedy_python(pairs, 4)
    # 'a' first (gain 3, id tie-break over b/d), then d (untouched,
    # gain 3), then b ({4,5} left, gain 2); c adds nothing -> early
    # stop at 3 rows.
    assert got == [(1, "a", 3, 3), (2, "d", 3, 6), (3, "b", 2, 8)]


def test_greedy_max_coverage_early_stop_and_nulls(spark):
    from q_digest_spark.operators.coverage import greedy_max_coverage

    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), (None, "y"), ("c", None)],
        "s string, e string",
    )
    got = greedy_max_coverage(df, "s", "e", k=5).collect()
    # only 'x' is coverable; after 'a' wins, b has gain 0 -> stop.
    assert len(got) == 1
    r = got[0]
    assert (r["sel_rank"], r["s"], r["gain"], r["cum_coverage"]) == (
        1, "a", 1, 1,
    )


def test_greedy_max_coverage_duplicate_pairs_counted_once(spark):
    from q_digest_spark.operators.coverage import greedy_max_coverage

    df = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 3 + [("b", "z")],
        "s string, e string",
    )
    got = {
        r["s"]: (r["gain"], r["cum_coverage"])
        for r in greedy_max_coverage(df, "s", "e", k=2).collect()
    }
    assert got == {"a": (2, 2), "b": (1, 3)}


def test_greedy_ratio_coverage_prefers_cheap_sets(spark):
    from q_digest_spark.operators.coverage import greedy_ratio_coverage

    # 'big' covers 4 elements at cost 100 (ratio 0.04/el-per-cost);
    # 'cheap' covers 2 at cost 10 (0.2) -> cheap wins round 1 despite
    # the smaller gain; plain max-coverage would pick big first.
    pairs = [("big", str(i)) for i in range(4)] + [
        ("cheap", "0"), ("cheap", "9"),
    ]
    df = spark.createDataFrame(pairs, "s string, e string")
    costs = spark.createDataFrame(
        [("big", 100), ("cheap", 10)], "s string, cost long"
    )
    got = [
        (r["sel_rank"], r["s"], r["gain"], r["cum_coverage"])
        for r in greedy_ratio_coverage(df, "s", "e", costs, k=3)
        .orderBy("sel_rank")
        .collect()
    ]
    assert got == [(1, "cheap", 2, 2), (2, "big", 3, 5)]


def test_greedy_ratio_coverage_drops_nonpositive_costs(spark):
    from q_digest_spark.operators.coverage import greedy_ratio_coverage

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "s string, e string"
    )
    costs = spark.createDataFrame(
        [("a", 0), ("b", 5)], "s string, cost long"
    )
    got = greedy_ratio_coverage(df, "s", "e", costs, k=2).collect()
    assert [r["s"] for r in got] == ["b"]
