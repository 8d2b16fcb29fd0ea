"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql side-by-side at a given sf_dir and compare row-count,
schema-width, and order-insensitive values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_entry(spark, con, name: str, fn, sql: str, sf_dir: str):
    sdf = canon(fn(spark, sf_dir).toPandas())
    ddf = canon(con.sql(sql).df())
    ok_rows = len(sdf) == len(ddf)
    ok_cols = list(sdf.columns) == list(ddf.columns)
    ok_vals = ok_rows and ok_cols and sdf.equals(ddf)
    if not ok_vals and ok_rows and ok_cols:
        # tolerate dtype mismatches by value-comparing as strings
        ok_vals = sdf.astype(str).equals(ddf.astype(str))
    return {
        "rows": (len(sdf), len(ddf)),
        "cols_match": ok_cols,
        "values_match": bool(ok_vals),
        "spark_cols": list(sdf.columns),
        "duck_cols": list(ddf.columns),
        "sdf": sdf,
        "ddf": ddf,
    }
