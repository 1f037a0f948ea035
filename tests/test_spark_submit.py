"""End-to-end `spark-submit --py-files` launch (north_star launch
contract): the job must import q_digest_spark from the zip alone —
the subprocess cwd is a temp dir, not the repo."""

import json
import os
import subprocess
import sys
import tempfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _run(zip_path, argv, cwd):
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
    ] + argv
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def pages_path(spark):
    from q_digest_spark.sources.webpages import generate_webpages

    d = os.path.join(tempfile.mkdtemp(prefix="qds_submit_"), "pages")
    generate_webpages(spark, 600, n_partitions=6).write.parquet(d)
    return d


@pytest.fixture(scope="module")
def pyfiles_zip():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build_zip

    return build_zip(tempfile.mkdtemp(prefix="qds_zip_"))


def test_submit_pipeline_runs_from_zip(pages_path, pyfiles_zip):
    with tempfile.TemporaryDirectory() as cwd:
        out = os.path.join(cwd, "run_out")
        rep = _run(pyfiles_zip, ["--pages", pages_path, "--out", out], cwd)
    assert rep["n_docs"] == 600
    assert set(rep["len_quantiles"]) == {"p50", "p95", "p99"}
    assert rep["distinct_urls"] > 500  # ~2% planted dup urls
    assert len(rep["heavy_domains"]) == 10
    assert rep["per_lang_token_p50"]  # at least one language present


def test_submit_pipeline_resumes_from_checkpoint(pages_path, pyfiles_zip):
    with tempfile.TemporaryDirectory() as cwd:
        out = os.path.join(cwd, "run_out")
        state = os.path.join(cwd, "state")
        args = ["--pages", pages_path, "--out", out, "--state-dir", state, "--job-id", "j1"]
        first = _run(pyfiles_zip, args, cwd)
        second = _run(pyfiles_zip, args, cwd)
    assert first["checkpoint"]["n_files_built"] > 0
    assert first["checkpoint"]["n_files_resumed"] == 0
    assert second["checkpoint"]["n_files_built"] == 0
    assert second["checkpoint"]["n_files_resumed"] == first["checkpoint"]["n_files_built"]
    assert second["len_quantiles"] == first["len_quantiles"]


def test_submit_pipeline_dedup_stage(pages_path, pyfiles_zip):
    """--dedup adds the exact-dedup stage: survivor count equals the
    distinct-content count (the generator plants ~2% duplicate urls
    whose text is identical), and survivors land under out/."""
    with tempfile.TemporaryDirectory() as cwd:
        out = os.path.join(cwd, "run_out")
        rep = _run(pyfiles_zip, ["--pages", pages_path, "--out", out, "--dedup"], cwd)
        assert "dedup_survivors" in rep
        assert 500 < rep["dedup_survivors"] < 600  # dups removed, most kept
        import glob

        assert glob.glob(os.path.join(out, "dedup_survivors", "*.parquet"))
