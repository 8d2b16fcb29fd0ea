"""Local replica of the driver's FULL correctness gate: every queries()
entry vs its oracle_sql at sf0.01 (the driver's gate scale), using the
same compare as tests/minidriver.py. Run before each round ends so
CORRECTNESS_r{N}.json holds no surprises:

    python scripts/full_gate.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from minidriver import compare_entry, duck_con  # noqa: E402

from dint_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    shutil.rmtree("/tmp/dint_spark_entry", ignore_errors=True)
    import __spark_entry__ as E

    spark = get_spark("full_gate", master="local[32]")
    con = duck_con(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    results, bad = {}, []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            if name not in oracles:
                # non-SQL-expressible entry: the driver's weaker
                # rows-only check (runs + stable schema + >= 0 rows)
                df = fn(spark, sf_dir)
                n = df.count()
                ok = n >= 0
                results[name] = {"rows_only": n,
                                 "spark_cols": list(df.columns),
                                 "sec": round(time.time() - t0, 1)}
            else:
                r = compare_entry(spark, con, name, fn, oracles[name],
                                  sf_dir)
                ok = r["values_match"] and r["cols_match"]
                r = {k: v for k, v in r.items() if k not in ("sdf", "ddf")}
                results[name] = {**r, "sec": round(time.time() - t0, 1)}
        except Exception as e:  # surface, don't abort the sweep
            ok = False
            results[name] = {"error": repr(e)[:500],
                             "sec": round(time.time() - t0, 1)}
        if not ok:
            bad.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({results[name]['sec']}s)", flush=True)
    out = os.path.join(REPO, "full_gate_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(qs) - len(bad)}/{len(qs)} green; details -> {out}")
    if bad:
        print("FAILING:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
