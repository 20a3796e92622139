"""End-to-end spark-submit --py-files packaging (BASELINE north_rule:
"packaged for spark-submit --py-files"): build the zip exactly as the
Makefile does, copy the CLI scripts OUT of the repo (so the package can
only come from the --py-files artifact, not the script-relative
sys.path fallback), then spark-submit a build and a query."""

import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(args, cwd, timeout=600):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    return subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.driver.memory=3g", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_spark_submit_py_files_build_and_query(tmp_path):
    zip_path = str(tmp_path / "refimage_spark.zip")
    subprocess.run(
        ["zip", "-qr", zip_path, "refimage_spark",
         "-x", "*/__pycache__/*", "-x", "*.pyc"],
        cwd=REPO, check=True,
    )
    # scripts live OUTSIDE the repo: their dirname(dirname(...)) sys.path
    # insert points at tmp_path, which has no package — only the zip does
    scripts = tmp_path / "scripts"
    scripts.mkdir()
    for name in ("build_index_cli.py", "query_cli.py"):
        shutil.copy(os.path.join(REPO, "scripts", name), scripts / name)
    idx = str(tmp_path / "idx")

    out = _submit(
        ["--py-files", zip_path, str(scripts / "build_index_cli.py"),
         "--synthetic", "500", "--index-dir", idx, "--num-parts", "4"],
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    metrics = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert metrics["n_docs"] > 400
    assert os.path.isdir(os.path.join(idx, "manifest"))

    out = _submit(
        ["--py-files", zip_path, str(scripts / "query_cli.py"),
         "--index-dir", idx, "--query", "red car OR blue house", "-k", "5"],
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    res = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res["query"] == "red car OR blue house"
    assert len(res["hits"]) == 5
    assert all(h["score"] > 0 for h in res["hits"])
