"""End-to-end spark-submit --py-files smoke test (north rule: the pipeline
"runs via spark-submit --py-files on a multi-executor cluster").

Packages dint_spark.zip, then spark-submits scripts/submit_job.py against a
local-cluster master (2 executor JVMs x 2 cores — real multi-executor
deployment with netty shuffle) with the repo deliberately NOT on
PYTHONPATH: the driver and both executors must resolve dint_spark from the
--py-files artifact alone, exactly as on a real cluster."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_pyfiles_multi_executor(tmp_path):
    zip_path = os.path.join(str(tmp_path), "dint_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"),
         zip_path],
        check=True,
    )
    idx_dir = os.path.join(str(tmp_path), "submit_idx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # only the zip may provide dint_spark
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [SPARK_SUBMIT,
         "--master", "local-cluster[2,2,2048]",
         "--py-files", zip_path,
         # custom daemon module: must come from executorEnv.PYTHONPATH —
         # --py-files reaches worker sys.path only after the daemon starts
         # (see scripts/submit_job.py docstring)
         "--conf", "spark.python.daemon.module=dint_spark.daemon",
         "--conf", f"spark.executorEnv.PYTHONPATH={zip_path}",
         "--conf", "spark.sql.shuffle.partitions=8",
         os.path.join(REPO, "scripts", "submit_job.py"),
         "3000", idx_dir, "50"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    line = next(ln for ln in res.stdout.splitlines()
                if ln.startswith('{"metric"'))
    out = json.loads(line)
    # rare-term queries can return < k docs; the bulk must be full
    assert 50 * 8 <= out["result_rows"] <= 50 * 10
    assert out["num_docs"] == 3000
    assert out["build_docs_per_sec"] > 0
    assert "local-cluster" in out["executors"]
