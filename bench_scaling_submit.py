#!/usr/bin/env python
"""Scaling evidence for the LITERAL north_star launch contract: the
identical `spark-submit --py-files` job (scripts/submit_pipeline.py)
run at N and 4N parallelism on the SAME input, throughput + efficiency
appended to BENCH/BASELINE.md.

Complements bench_scaling.py (in-process workloads, weak scaling):
here the unit is the whole packaged pipeline — zip shipping, fused
multi-sketch pass, grouped per-lang medians, sketch-side heavy
hitters, sketch/metrics table writes.

Methodology matches bench_scaling.py: fresh JVM per run, best-of-2,
taskset-pinned to 2N cpus (a local[N] UDF stage occupies up to 2N
cores: JVM + pipelined Python workers). Primary comparison is
local[1] -> local[4] (2 -> 8 pinned cpus, below this VM's documented
DRAM-throttle knee); local[8] -> local[32] (unpinned — 2N would
exceed the machine) is also reported as the task brief's literal
example pair.

Usage: python bench_scaling_submit.py
Env:   SUBMIT_SCALING_ROWS (default 200000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SUBMIT_SCALING_ROWS", "200000"))
# per-level repeats (min kept). 2 suffices on a quiet host; raise to 3+
# when /proc/stat shows neighbor steal, which hits pinned runs hardest.
REPEATS = int(os.environ.get("SUBMIT_SCALING_REPEATS", "2"))
PAGES = os.path.join(REPO, ".bench_tmp", f"pages_{ROWS}")
MARKER = "## spark-submit --py-files pipeline scaling (the literal launch contract)"


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _ensure_pages() -> None:
    if os.path.exists(PAGES):
        return
    from q_digest_spark.plans.session import get_spark
    from q_digest_spark.sources.webpages import generate_webpages

    spark = get_spark("submit-scaling-gen", cores=32)
    generate_webpages(spark, ROWS, n_partitions=128).write.mode("overwrite").parquet(PAGES)
    spark.stop()


def _run_once(zip_path: str, cores: int, pin: bool) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"qds_subscale_{cores}_")
    cmd = [
        _spark_submit(),
        "--master", f"local[{cores}]",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 4)}",
        "--conf", "spark.sql.files.maxPartitionBytes=2097152",
        "--conf", "spark.sql.files.openCostInBytes=262144",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
        "--pages", PAGES,
        "--out", os.path.join(out_dir, "run"),
    ]
    if pin:
        cmd = ["taskset", "-c", f"0-{2 * cores - 1}"] + cmd
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800, env=env)
    wall = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        print(p.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"spark-submit at local[{cores}] failed")
    rep = json.loads(lines[-1])
    rep["wall_sec"] = round(wall, 2)
    return rep


def main() -> None:
    _ensure_pages()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build_zip

    zip_path = build_zip(tempfile.mkdtemp(prefix="qds_subzip_"))
    levels = [(1, True), (4, True), (8, False), (32, False)]
    best: dict[int, dict] = {}
    for cores, pin in levels:
        runs = [_run_once(zip_path, cores, pin) for _ in range(REPEATS)]
        best[cores] = min(runs, key=lambda r: r["total_sec"])
        print(
            f"local[{cores}]{' pinned' if pin else ''}: "
            f"{best[cores]['total_sec']}s pipeline, {best[cores]['docs_per_sec']} docs/s",
            file=sys.stderr,
        )

    thr = {c: best[c]["docs_per_sec"] for c, _ in levels}
    eff_1_4 = round(thr[4] / (4 * thr[1]), 3)
    eff_8_32 = round(thr[32] / (4 * thr[8]), 3)
    report = {
        "metric": "submit_pipeline_docs_per_sec",
        "rows": ROWS,
        "throughput": {str(c): thr[c] for c, _ in levels},
        "pipeline_sec": {str(c): best[c]["total_sec"] for c, _ in levels},
        "efficiency_n1_to_n4": eff_1_4,
        "efficiency_n8_to_n32": eff_8_32,
    }

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    existing = ""
    tail = ""
    if os.path.exists(md_path):
        existing = open(md_path).read()
        if MARKER in existing:
            start = existing.index(MARKER)
            # preserve any LATER sections (e.g. the clean-host floors
            # table): the replaced region ends at the next "## " heading
            nxt = existing.find("\n## ", start + len(MARKER))
            if nxt != -1:
                tail = "\n" + existing[nxt + 1 :]
            existing = existing[:start].rstrip() + "\n"
    section = [
        "",
        MARKER,
        "",
        f"The packaged pipeline job (`spark-submit --py-files dist/q_digest_spark.zip",
        f"scripts/submit_pipeline.py`) on the same {ROWS:,}-page input, fresh JVM,",
        "best-of-2. Stages: fused Q-Digest+HLL+Bloom single pass, per-lang",
        "token-median grouped pass, CMS heavy-hitter domains, sketch+metrics writes.",
        "",
        "| level | pipeline sec | docs/sec |",
        "|---|---|---|",
    ]
    for c, pin in levels:
        section.append(
            f"| local[{c}]{' (pinned 0-' + str(2 * c - 1) + ')' if pin else ''} "
            f"| {best[c]['total_sec']} | {thr[c]:,} |"
        )
    section += [
        "",
        f"- efficiency local[1] -> local[4] (primary, below the DRAM knee): **{eff_1_4}**",
        f"- efficiency local[8] -> local[32] (the task brief's example pair; unpinned,",
        f"  above the documented ~5 GB/s host DRAM throttle): **{eff_8_32}**",
        "",
        "Reproduce: `python bench_scaling_submit.py`.",
        "",
    ]
    with open(md_path, "w") as f:
        f.write(existing + "\n".join(section) + tail)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
