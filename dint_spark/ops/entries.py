"""Driver-contract entries for the ops modules (dedup, text analysis,
similarity search, multimodal)."""

from __future__ import annotations


def spark_queries() -> dict:
    out: dict = {}
    for mod in _modules():
        out.update(mod.SPARK_QUERIES)
    return out


def oracle_sqls() -> dict:
    out: dict = {}
    for mod in _modules():
        out.update(mod.ORACLE_SQLS)
    return out


def _modules():
    from dint_spark.ops import textstats

    mods = [textstats]
    for name in ("webtext", "dedup", "similarity", "multimodal", "events"):
        try:
            mods.append(
                __import__(f"dint_spark.ops.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods
