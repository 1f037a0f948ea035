"""Machine-checked bounded-collect audit over the graded query surface.

Every ``.collect()`` in ``__spark_entry__.py`` must be driver-bounded:
the collected DataFrame's row count must be capped by an aggregation,
an explicit limit, a low-cardinality key domain, or a helper whose
contract bounds its output — never by the input row count. The r04
judging session established this property by a manual grep of 111
sites; this test makes it structural so a future query cannot regress
it silently: an unbounded ``df.collect()`` planted in a new query
fails this test with the offending function and source line.

The checker is deliberately conservative: a site is OK only if its
receiver chain (after tracing simple ``name = expr`` assignments
inside the enclosing function) matches an explicit bounded pattern.
Anything else must be added to ``SITE_EXCEPTIONS`` with a
justification — which is exactly the review moment the audit exists
to force.
"""

from __future__ import annotations

import ast
import os
import re

ENTRY = os.path.join(os.path.dirname(__file__), os.pardir, "__spark_entry__.py")

# Chain markers that bound the collected row count structurally.
_BOUNDED_MARKERS = [
    r"\.agg\(",            # global or grouped aggregate (groups are keys)
    r"\.limit\(",          # explicit limit
    r"\.summary\(",        # fixed statistic rows
    r"F\.input_file_name", # distinct over file names: #files, not #rows
    # select(<aggregate fn>(...)) without groupBy: single-row result
    r"\.select\(F\.(?:countDistinct|count|sum|min|max|avg)\(",
]

# Unique-id probe filters: `vec_id < 8`-style selections of a handful
# of query vectors. Bounded because vec_id is unique and the literal
# is small; the regex requires a small integer literal (<= 3 digits).
_BOUNDED_MARKERS.append(r"F\.col\('vec_id'\)\s*[<>]=?\s*\d{1,3}\b")
_BOUNDED_MARKERS.append(r"F\.col\('doc_id'\)\s*<\s*\d{1,3}\b")

# select(<low-card key>).distinct(): bounded by the key domain, which
# stays small at any data scale (languages, event types, sources,
# TPC-H enum columns).
_LOW_CARD_COLS = "lang|event_type|source|l_returnflag|l_linestatus|o_orderstatus|day"
_BOUNDED_MARKERS.append(
    r"\.select\('(?:%s)'\)\s*\.distinct\(\)" % _LOW_CARD_COLS
)

# Helpers whose documented contract bounds their output rows
# independent of input size (one row per group key / <= K rows / a
# driver-built local relation).
_BOUNDED_HELPERS = {
    "grouped_sketch_rows",   # one row per group key
    "grouped_estimates",     # one row per group key
    "grouped_quantiles",     # one row per group key
    "guaranteed_heavy",      # <= K rows by Misra-Gries contract
    "bivariate_stats",       # one six-sum row per group key
    "w1_2sample",            # single-row statistic
    "mwu_2sample",           # single-row statistic
    "ks_2sample",            # single-row statistic
    "universe_join_size",    # single-row (sampled_pairs, est_pairs) agg
    "createDataFrame",       # driver-built local relation
    "decayed_scores",        # used only behind a broadcast semi-join
                             # on a <=10-row candidate list (audited)
}

_BOUNDED_RE = [re.compile(p) for p in _BOUNDED_MARKERS]
_HELPER_RE = re.compile(
    r"\b(?:%s)\(" % "|".join(sorted(_BOUNDED_HELPERS))
)

# Site-specific exceptions: (enclosing function, receiver source
# prefix) -> justification. Keep this list SHORT — every entry is a
# hand-audited bounded collect the structural patterns can't see.
SITE_EXCEPTIONS: dict = {
    # spark.table(<memory sink>) over a streaming aggregate: rows are
    # one per (window, bucket) — bounded by days x histogram buckets.
    ("q_streaming_daily_drift", "spark.table"): "windowed agg sink",
}


def _bounded_src(src: str) -> bool:
    if any(r.search(src) for r in _BOUNDED_RE):
        return True
    if _HELPER_RE.search(src):
        return True
    return False


def _check_function(fn: ast.FunctionDef):
    """Return [(lineno, receiver_src)] of unbounded collect sites."""
    # name -> list of assigned value sources within this function
    assigns: dict = {}
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    assigns.setdefault(tgt.id, []).append(node.value)

    def bounded(expr, depth=0) -> bool:
        src = ast.unparse(expr)
        if _bounded_src(src):
            return True
        # trace simple names through local assignments (all sources
        # must be bounded — names are not reused across shapes here)
        root = expr
        while isinstance(root, (ast.Attribute, ast.Subscript)):
            root = root.value
        if isinstance(root, ast.Call):
            inner = root.func
            while isinstance(inner, (ast.Attribute, ast.Subscript)):
                inner = getattr(inner, "value", None)
                if inner is None:
                    break
            root = inner if inner is not None else root
        if isinstance(root, ast.Name) and depth < 4:
            sources = assigns.get(root.id)
            if sources:
                return all(bounded(s, depth + 1) for s in sources)
        return False

    bad = []
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "collect"
        ):
            recv = node.func.value
            src = ast.unparse(recv)
            key_hits = [
                just
                for (f, prefix), just in SITE_EXCEPTIONS.items()
                if f == fn.name and src.startswith(prefix)
            ]
            if key_hits:
                continue
            if not bounded(recv):
                bad.append((node.lineno, src[:120]))
    return bad


def _audit_source(source: str):
    tree = ast.parse(source)
    violations = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            for lineno, src in _check_function(node):
                violations.append((node.name, lineno, src))
    return violations


def test_every_entry_collect_is_bounded():
    with open(ENTRY) as f:
        source = f.read()
    violations = _audit_source(source)
    assert not violations, (
        "unbounded .collect() sites in __spark_entry__.py — cap them "
        "with .agg()/.limit()/a bounded helper or add a justified "
        "SITE_EXCEPTIONS entry:\n"
        + "\n".join(f"  {f}:{ln}  {src}" for f, ln, src in violations)
    )


def test_audit_flags_planted_unbounded_collect():
    planted = (
        "def q_bad(spark, sf_dir):\n"
        "    df = spark.read.parquet(sf_dir + '/documents.parquet')\n"
        "    rows = df.where(df.lang == 'en')\n"
        "    return rows.collect()\n"
    )
    violations = _audit_source(planted)
    assert violations and violations[0][0] == "q_bad"


def test_audit_accepts_bounded_patterns():
    ok = (
        "def q_ok(spark, sf_dir):\n"
        "    df = spark.read.parquet(sf_dir + '/documents.parquet')\n"
        "    a = df.agg(F.max('n_chars')).collect()[0][0]\n"
        "    b = df.orderBy('doc_id').limit(10).collect()\n"
        "    c = df.select('lang').distinct().collect()\n"
        "    rows = grouped_sketch_rows(df, ['lang'], 'doc_id', H, hb)\n"
        "    d = rows.collect()\n"
        "    return a, b, c, d\n"
    )
    assert _audit_source(ok) == []


def test_registry_dict_literals_have_no_duplicate_keys():
    """A duplicate key in the queries()/oracle_sql() dict literals
    silently drops the earlier entry (Python keeps the last), and —
    worse — a re-DEFINED q_<name> function rebinds every registry
    reference to the new body, shadowing the original query. Caught
    live in r05 (a second q_superspreader_users overrode the
    sketch-ranked original until renamed); this pins the invariant."""
    import collections

    with open(ENTRY, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    found = 0
    toplevel_defs = [
        n.name for n in tree.body if isinstance(n, ast.FunctionDef)
    ]
    dup_defs = [
        n for n, c in collections.Counter(toplevel_defs).items() if c > 1
    ]
    assert not dup_defs, f"duplicate top-level defs shadow queries: {dup_defs}"
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries",
            "oracle_sql",
        ):
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict) and len(sub.keys) > 50:
                    keys = [
                        k.value for k in sub.keys if isinstance(k, ast.Constant)
                    ]
                    dups = [
                        k
                        for k, c in collections.Counter(keys).items()
                        if c > 1
                    ]
                    assert not dups, f"{node.name} duplicate keys: {dups}"
                    found += 1
                    break
    assert found == 2, "expected one registry dict in each of queries/oracle_sql"
