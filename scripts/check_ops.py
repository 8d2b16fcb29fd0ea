"""Fast local loop: compare selected ops entries vs their DuckDB oracles at
sf0.01, exactly as the driver does. Usage: python scripts/check_ops.py [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from minidriver import compare_entry, duck_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from dint_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = sys.argv[1:]
    qs = entry.queries()
    os_ = entry.oracle_sql()
    if not names:
        names = [n for n in qs if n in os_]
    spark = get_spark("check_ops")
    con = duck_con(SF_DIR)
    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            failed.append(name)
            continue
        try:
            r = compare_entry(spark, con, name, qs[name], os_[name], SF_DIR)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        status = "OK" if (r["values_match"] and r["cols_match"]) else "FAIL"
        print(f"{name}: {status} rows={r['rows']}")
        if status == "FAIL":
            failed.append(name)
            print("  spark cols:", r["spark_cols"])
            print("  duck  cols:", r["duck_cols"])
            if r["rows"][0] == r["rows"][1] and r["cols_match"]:
                neq = ~(r["sdf"] == r["ddf"]).all(axis=1)
                print("  first diffs (spark | duck):")
                print(r["sdf"][neq].head(5).to_string())
                print(r["ddf"][neq].head(5).to_string())
            else:
                print("  spark head:\n", r["sdf"].head(5).to_string())
                print("  duck head:\n", r["ddf"].head(5).to_string())
    print(f"\n{len(names) - len(failed)}/{len(names)} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
