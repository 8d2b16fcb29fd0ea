"""Build dint_spark.zip for spark-submit --py-files (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage:
    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files dint_spark.zip \
        --conf spark.python.daemon.module=dint_spark.daemon your_job.py

The zip contains only the package sources (no tests, no caches), laid out
so `import dint_spark` works from the executor's PYTHONPATH. The daemon
preload module rides along, so the worker-import-storm fix applies on the
cluster exactly as it does locally (dint_spark/daemon.py).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> list[str]:
    names = []
    pkg_root = os.path.join(REPO, "dint_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
                names.append(arc)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dint_spark.zip")
    names = build(out)
    print(f"{out}: {len(names)} files")
