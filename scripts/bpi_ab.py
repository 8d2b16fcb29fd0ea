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


_BASELINES = ["pef", "optpfor", "simple16", "qmx", "streamvbyte",
              "varintg8iu"]


def baseline_bpi(idx) -> dict:
    """Comparison-codec rows, the reference README benchmark-table roles:
    PEF ('PEF eps-opt'), OptPFor, Simple16, StreamVByte, Varint-G8IU
    (SURVEY §2 C4/C5/C7/C8). One decode pass; every decoded posting list
    is encoded under each codec — PEF takes docs as the monotone id
    sequence (+1 to make ids positive) and freqs as the prefix-sum
    positive_sequence, the block codecs take the reference's gap/freq
    convention (d[i]-d[i-1]-1, f-1; vroom_env/encode.cpp:38-58) — and
    the row is measured output_bytes*8/postings."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dint_spark.queries import decoded_postings

    cols = [f"{c}_{w}" for c in _BASELINES for w in ("db", "fb")]

    def per_term(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from dint_spark.dint.blockcodecs import CODECS
        from dint_spark.dint.pef import pef_encoded_bytes

        pdf = pdf.sort_values("doc_id")
        docs = pdf["doc_id"].to_numpy(dtype="int64")
        freqs = pdf["freq"].to_numpy(dtype="int64")
        gaps = np.diff(docs, prepend=-1) - 1
        out = {
            "pef_db": [pef_encoded_bytes(docs + 1)],
            "pef_fb": [pef_encoded_bytes(np.cumsum(freqs))],
            "n": [len(docs)],
        }
        for name, (enc, _) in CODECS.items():
            out[f"{name}_db"] = [len(enc(gaps))]
            out[f"{name}_fb"] = [len(enc(freqs - 1))]
        return pd.DataFrame(out)

    schema = ", ".join(f"{c} long" for c in cols) + ", n long"
    row = (decoded_postings(idx)
           .groupBy("term_id")
           .applyInPandas(per_term, schema)
           .agg(*[F.sum(c).alias(c) for c in cols + ["n"]])
           .collect()[0])
    n = int(row["n"])
    return {name: {"docs_bpi": round(int(row[f"{name}_db"]) * 8 / n, 3),
                   "freqs_bpi": round(int(row[f"{name}_fb"]) * 8 / n, 3)}
            for name in _BASELINES}


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
        if name == "single":
            res.update(baseline_bpi(idx))
            for b in _BASELINES:
                print(b, res[b], flush=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
