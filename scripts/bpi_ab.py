"""A/B bits-per-posting comparison: single vs multi-dictionary DINT.

Builds the same bench corpus (sf0.1 documents + 10k synthetic Zipfian
pages, seed 42 — exactly bench.py's mix) under each dictionary variant and
reports docs/freqs bpi per the reference protocol
(vroom_env/encode.cpp:38-58: output_bytes*8/num_total_ints, gaps d[i]-d[i-1]-1,
freqs f-1). Reference README table: single_packed 5.939 docs bpi,
multi_packed (6 context dicts) 4.766.

Usage: python scripts/bpi_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dint_spark.session import get_spark  # noqa: E402
from dint_spark.corpus import generate_pages, pages_from_documents  # noqa: E402
from dint_spark.index import IndexConfig, build_index  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpi_ab", master="local[16]", shuffle_partitions=16)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_from_documents(docs).unionByName(
        generate_pages(spark, 10_000, seed=42)).persist()
    pages.count()
    res = {}
    for name, cfg in [
        ("single", IndexConfig(num_buckets=8, input_tag="bpi-s")),
        ("multi2", IndexConfig(num_buckets=8, input_tag="bpi-m2",
                               dict_variant="multi", num_dicts=2)),
        ("multi6", IndexConfig(num_buckets=8, input_tag="bpi-m6",
                               dict_variant="multi", num_dicts=6)),
    ]:
        out = f"/tmp/dint_bpi_ab/{name}"
        shutil.rmtree(out, ignore_errors=True)
        idx = build_index(spark, pages, out, cfg)
        m = idx.metrics()
        res[name] = {"docs_bpi": round(m["docs_bpi"], 3),
                     "freqs_bpi": round(m["freqs_bpi"], 3)}
        print(name, res[name], flush=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
