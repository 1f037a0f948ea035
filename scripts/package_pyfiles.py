#!/usr/bin/env python
"""Build dist/q_digest_spark.zip for `spark-submit --py-files`.

Usage: python scripts/package_pyfiles.py [out_dir]
Prints the zip path on stdout.
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, "q_digest_spark")
    return shutil.make_archive(base, "zip", root_dir=REPO, base_dir="q_digest_spark")


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
