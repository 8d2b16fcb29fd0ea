"""The --py-files artifact must be importable standalone (what an executor
sees after spark-submit --py-files dint_spark.zip)."""

import os
import subprocess
import sys


def test_zip_imports_standalone(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(str(tmp_path), "dint_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_pyfiles_zip.py"), out],
        check=True,
    )
    # import from the zip alone, in a clean interpreter with the repo NOT
    # on sys.path (zipimport is exactly how executors load --py-files)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import dint_spark, dint_spark.daemon, dint_spark.queries, "
        "dint_spark.dint.codec; "
        "print(dint_spark.__version__)"
    )
    res = subprocess.run(
        [sys.executable, "-c", probe, out],
        capture_output=True, text=True, check=True, cwd=str(tmp_path),
    )
    assert res.stdout.strip()
