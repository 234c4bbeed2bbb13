"""North-rule invocation smoke: the pipeline must run via
`spark-submit --py-files <pkg.zip> causalre_spark/main.py` — the exact
cluster submission shape (package shipped as a zip on PYTHONPATH, not
an installed library). Asserts the run emits its summary JSON, writes
stage tables + the per-partition lineage metrics table, and that a
--resume rerun completes (markers honored).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    # pip-installed pyspark ships the launcher next to the package
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:  # pragma: no cover
        pytest.skip("spark-submit launcher not available")

    zip_base = str(tmp_path / "causalre_spark_pkg")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=REPO,
                                   base_dir="causalre_spark")
    out = str(tmp_path / "kg_run")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip alone must satisfy imports
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [submit, "--master", "local[4]",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--conf", "spark.driver.memory=3g",
           "--py-files", zip_path,
           os.path.join(REPO, "causalre_spark", "main.py"),
           "--synthetic", "40", "--out", out]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["triples"] >= 0 and summary["workdir"] == out
    # the submit-provided master must win over get_spark's local default
    assert summary["master"] == "local[4]", summary

    # stage tables + lineage metrics landed in the workdir
    produced = set(os.listdir(out))
    assert "_metrics" in produced, produced
    assert any(s in produced for s in ("docs", "triples")), produced

    # --resume rerun completes and reports the same triple count
    r2 = subprocess.run(cmd + ["--resume"], capture_output=True, text=True,
                        timeout=600, cwd=str(tmp_path), env=env)
    assert r2.returncode == 0, r2.stderr[-4000:]
    summary2 = json.loads(
        [ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary2["triples"] == summary["triples"]
