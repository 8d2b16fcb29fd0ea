"""Driver-contract entries for the ops modules (filled incrementally)."""

from __future__ import annotations


def spark_queries() -> dict:
    return {}


def oracle_sqls() -> dict:
    return {}
