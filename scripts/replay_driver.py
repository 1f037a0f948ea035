#!/usr/bin/env python
"""Replay the grading-driver contract end to end (see
.claude/skills/verify/SKILL.md): fresh process, own SparkSession, run
every `queries()` entry AND its `oracle_sql()` against the same
parquet tables at sf0.01, and compare the way the driver does —
row count, column-name set, and per-value equality after sorting
columns by name and rows by their stringified tuple.

Numeric normalization mirrors the driver's hash semantics: DuckDB
returns nullable BIGINT as float64 via pandas, so int-valued floats
are canonicalized to int before comparison; genuine floats compare
to 9 significant digits.

Usage:
    python scripts/replay_driver.py [query ...]     # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/replay_driver.py

Rotation-proofing (the grading driver samples ~50 queries/round, so an
edit to a rotated-out query can go unguarded for a round):
    python scripts/replay_driver.py --write-manifest [query ...]
        full replay as above, then records per-query row count +
        sha256 of the canonicalized result into tests/replay_manifest.json
        for every PASSING query (rows-only queries record the Spark
        side alone).
    python scripts/replay_driver.py --check-manifest [query ...]
        FAST drift check: runs only the Spark side and diffs each
        result digest against the manifest — no DuckDB pass. A diff
        means the query's output changed since it last passed a full
        replay: re-verify it fully, then --write-manifest to re-pin.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return int(v)
        return float(f"{v:.9g}")
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(str, t)))


MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "replay_manifest.json",
)


def _digest(cols, rows) -> str:
    import hashlib
    import json

    return hashlib.sha256(
        json.dumps([cols, rows], default=str).encode()
    ).hexdigest()


def _load_manifest() -> dict:
    import json

    if not os.path.exists(MANIFEST_PATH):
        return {}
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def _save_manifest(m: dict) -> None:
    import json

    with open(MANIFEST_PATH, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
        f.write("\n")


def main(argv):
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    write_manifest = "--write-manifest" in argv
    check_manifest = "--check-manifest" in argv
    argv = [a for a in argv if not a.startswith("--")]

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = E.queries(), E.oracle_sql()
    names = argv or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    if check_manifest:
        return _check_against_manifest(spark, qs, names)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    manifest = _load_manifest() if write_manifest else None
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append((name, f"spark raised: {e!r:.300}"))
            print(f"FAIL  {name}: spark raised {e!r:.200}")
            continue
        if name not in osql:
            n_rows_only += 1
            if manifest is not None:
                sc, sv = _canon(scols, [tuple(r) for r in srows])
                manifest[name] = {
                    "rows": len(sv),
                    "sha256": _digest(sc, sv),
                    "oracle": False,
                    "sf_dir": SF_DIR,
                }
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append((name, f"duckdb raised: {e!r:.300}"))
            print(f"FAIL  {name}: duckdb raised {e!r:.200}")
            continue
        sc, sv = _canon(scols, [tuple(r) for r in srows])
        oc, ov = _canon(ocols, orows)
        if sc != oc:
            n_fail += 1
            failures.append((name, f"schema {sc} != {oc}"))
            print(f"FAIL  {name}: schema {sc} != {oc}")
        elif len(sv) != len(ov):
            n_fail += 1
            failures.append((name, f"rows {len(sv)} != {len(ov)}"))
            print(f"FAIL  {name}: rows {len(sv)} != {len(ov)}")
        elif sv != ov:
            n_fail += 1
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b
            )
            failures.append((name, f"values differ at sorted row {diff[0]}"))
            print(f"FAIL  {name}: first differing sorted row "
                  f"{diff[0]}:\n  spark {diff[1]}\n  duck  {diff[2]}")
        else:
            n_pass += 1
            if manifest is not None:
                manifest[name] = {
                    "rows": len(sv),
                    "sha256": _digest(sc, sv),
                    "oracle": True,
                    "sf_dir": SF_DIR,
                }
            print(f"pass  {name}: {len(sv)} rows [{time.time() - t0:.1f}s]")

    if manifest is not None:
        _save_manifest(manifest)
        print(f"manifest: {len(manifest)} entries -> {MANIFEST_PATH}")
    print(
        f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only "
        f"of {len(names)} at {SF_DIR}"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    return 1 if n_fail else 0


def _check_against_manifest(spark, qs, names) -> int:
    """Spark-only drift check against tests/replay_manifest.json."""
    manifest = _load_manifest()
    if not manifest:
        print(f"no manifest at {MANIFEST_PATH}; run --write-manifest first",
              file=sys.stderr)
        return 2
    n_ok = n_drift = n_missing = 0
    drifts = []
    for name in names:
        t0 = time.time()
        if name not in manifest:
            n_missing += 1
            print(f"new?  {name}: not in manifest (run --write-manifest)")
            continue
        want = manifest[name]
        try:
            sdf = qs[name](spark, SF_DIR)
            sc, sv = _canon(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        except Exception as e:  # noqa: BLE001
            n_drift += 1
            drifts.append((name, f"spark raised: {e!r:.200}"))
            print(f"DRIFT {name}: spark raised {e!r:.200}")
            continue
        got = {"rows": len(sv), "sha256": _digest(sc, sv)}
        if got["rows"] != want["rows"] or got["sha256"] != want["sha256"]:
            n_drift += 1
            drifts.append(
                (name, f"rows {want['rows']}->{got['rows']}, "
                       f"hash {want['sha256'][:12]}->{got['sha256'][:12]}")
            )
            print(f"DRIFT {name}: rows {want['rows']}->{got['rows']} "
                  f"[{time.time() - t0:.1f}s]")
        else:
            n_ok += 1
            print(f"ok    {name}: {got['rows']} rows [{time.time() - t0:.1f}s]")
    print(f"\n{n_ok} ok / {n_drift} drift / {n_missing} unpinned "
          f"of {len(names)} vs manifest at {SF_DIR}")
    for name, why in drifts:
        print(f"  DRIFT {name}: {why}")
    spark.stop()
    return 1 if n_drift else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
