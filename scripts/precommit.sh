#!/usr/bin/env bash
# Pre-commit gate for the graded query surface (VERDICT r04 task 8).
#
# Runs the two cheap structural guards that protect the rotated-out
# queries the per-round driver sample never sees:
#   1. scripts/replay_driver.py --check-manifest  — Spark-side row
#      count + result sha256 of EVERY queries() entry at sf0.01
#      against tests/replay_manifest.json (no DuckDB; ~minutes).
#   2. the extract_text golden-byte hashes + entry-shape audits —
#      the input_hint per-row invariant and the bounded-collect gate.
#
# Install:  ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
# Skip (for docs-only commits):  git commit --no-verify
set -euo pipefail
# readlink -f: resolve the .git/hooks/pre-commit symlink back to
# scripts/ so the repo-root cd works when invoked as a hook.
cd "$(dirname "$(readlink -f "$0")")/.."

echo "[precommit] 1/2 replay manifest check (Spark-only, sf0.01)"
python scripts/replay_driver.py --check-manifest

echo "[precommit] 2/2 golden text hashes + entry-shape audits"
python -m pytest -x -q \
    tests/test_text_and_webpages.py::test_extract_text_golden_hashes \
    tests/test_entry_shapes.py

echo "[precommit] OK"
