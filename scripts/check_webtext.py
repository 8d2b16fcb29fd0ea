"""One-off: run the webtext ops against the DuckDB oracle at sf0.001/sf0.01."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from minidriver import compare_entry, duck_con  # noqa: E402

from dint_spark.ops import webtext  # noqa: E402
from dint_spark.session import get_spark  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark()
con = duck_con(sf)
fail = 0
for name, fn in webtext.SPARK_QUERIES.items():
    r = compare_entry(spark, con, name, fn, webtext.ORACLE_SQLS[name], sf)
    ok = r["cols_match"] and r["rows"][0] == r["rows"][1] and r["values_match"]
    print(f"{name}: rows={r['rows']} cols={r['cols_match']} "
          f"vals={r['values_match']} -> {'OK' if ok else 'FAIL'}")
    if not ok:
        fail += 1
        print("  spark cols:", r["spark_cols"])
        print("  duck  cols:", r["duck_cols"])
        print(r["sdf"].head(5))
        print(r["ddf"].head(5))
sys.exit(fail)
