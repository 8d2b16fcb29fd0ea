"""Custom PySpark worker daemon that preloads the heavy libraries.

PySpark forks one python worker per concurrent task from a daemon process.
With the stock daemon each forked worker imports numpy/pandas/pyarrow (and
this package) on its first task: ~2s of CPU and disk I/O per worker, which
at local[32] turns the first pandas stage after any idle period into a
30-80s import storm (measured; workers are also culled after an idle
timeout, so the storm repeats between JVM-heavy phases of the index build).

Importing everything HERE — in the daemon, before any fork — makes every
worker inherit the warmed modules through copy-on-write fork memory:
worker startup drops to milliseconds.

Activated by session.py via spark.python.daemon.module=dint_spark.daemon;
on a real cluster the package reaches executors with spark-submit
--py-files, so the same preload works there.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # pyarrow backs every Arrow-batched UDF in this engine
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:  # warm this package's kernels too (cheap once numpy is in)
    import dint_spark.bm25  # noqa: F401
    import dint_spark.dint.codec  # noqa: F401
    import dint_spark.dint.dictionary  # noqa: F401
    import dint_spark.queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
