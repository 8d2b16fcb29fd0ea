"""Fuzzy-matching scale bench: SymSpell delete probe vs vocab-wide
levenshtein scan on a WEB-SIZED vocabulary (default 10M distinct terms —
the regime the delete table exists for; corpus indexes in this sandbox
cap at 30k synthetic terms, far too small to show the effect).

Builds a deterministic vocabulary parquet (term = 't' + base36(id), df
from a hash — no external data), materializes the delete neighborhood
with search.build_fuzzy_table at the given ``max_edits`` (1 or 2; the
delete-2 table is ~(avg_len+2)/2 x bigger and probes grow by the same
factor — both sizes are REPORTED so the trade is measured, not
asserted), then resolves the same typo batch through (a) the pushed-IN
key probe and (b) the fallback distributed levenshtein scan, asserting
identical expansions and reporting both walls. The probe wall is what a
query pays at ANY vocabulary size (keys bounded by the word's delete
neighborhood, file pruning via the range-partitioned sorted key); the
scan wall grows linearly with the vocabulary.

Usage: python scripts/fuzzy_scale_bench.py [n_terms] [n_words] [max_edits]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _VocabOnly:
    """The minimal index surface fuzzy_term_ids/build_fuzzy_table touch:
    a vocab() DataFrame, the index dir, num_terms, and the session."""

    def __init__(self, spark, d: str, n: int):
        self.spark, self.dir, self.num_terms = spark, d, n

    def vocab(self):
        return self.spark.read.parquet(os.path.join(self.dir,
                                                    "vocab.parquet"))


def main() -> None:
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_edits = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from bench import host_health_probe
    from dint_spark.search import build_fuzzy_table, fuzzy_term_ids
    from dint_spark.session import get_spark

    health = host_health_probe()
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fuzzy_scale_bench", master=f"local[{n_cpus}]",
                      shuffle_partitions=max(32, n_cpus))

    d = f"/tmp/fuzzy_vocab_{n_terms}"
    vpath = os.path.join(d, "vocab.parquet")
    if not os.path.exists(os.path.join(vpath, "_SUCCESS")):
        t0 = time.time()
        (spark.range(n_terms)
         .select(F.concat(F.lit("t"), F.lower(F.conv(F.col("id"), 10, 36)))
                 .alias("term"),
                 F.col("id").alias("term_id"),
                 (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("df"))
         .write.mode("overwrite").parquet(vpath))
        print(f"vocab gen: {time.time() - t0:.1f}s", file=sys.stderr)
    idx = _VocabOnly(spark, d, n_terms)

    t0 = time.time()
    fpath = build_fuzzy_table(spark, idx, max_edits=max_edits)
    t_build = time.time() - t0
    n_keys = spark.read.parquet(fpath).count()
    tbl_bytes = sum(os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(fpath) for f in fs)
    n_files = len([f for f in os.listdir(fpath) if f.endswith(".parquet")])

    # deterministic typo batch over real vocab terms: substitution,
    # deletion, insertion, exact, and a guaranteed miss
    base = [r["term"] for r in idx.vocab()
            .orderBy(F.desc("df"), F.asc("term")).limit(n_words).collect()]
    words = []
    for i, w in enumerate(base):
        words.append([w[:-1] + "q", w[:-1], w + "q", w][i % 4])
    if max_edits >= 2:  # double typos only the 2-edit contract matches
        words += [w[:-2] + "qq" for w in base[:4]]
    words.append("zzzzzzzzq")

    # warm both paths once (session/code init), then time
    fuzzy_term_ids(idx, words[:2], fuzzy_path=fpath, max_edits=max_edits)
    t0 = time.time()
    probe = fuzzy_term_ids(idx, words, fuzzy_path=fpath,
                           max_edits=max_edits)
    t_probe = time.time() - t0

    fuzzy_term_ids(idx, words[:2], fuzzy_path="/tmp/does_not_exist_x",
                   max_edits=max_edits)
    t0 = time.time()
    scan = fuzzy_term_ids(idx, words, fuzzy_path="/tmp/does_not_exist_x",
                          max_edits=max_edits)
    t_scan = time.time() - t0

    assert probe == scan, "probe expansions != levenshtein-scan expansions"
    print(json.dumps({
        "n_terms": n_terms, "n_words": len(words),
        "max_edits": max_edits,
        "delete_table_rows": n_keys, "delete_table_bytes": tbl_bytes,
        "delete_table_files": n_files,
        "build_table_s": round(t_build, 2),
        "probe_batch_s": round(t_probe, 2),
        "levenshtein_scan_batch_s": round(t_scan, 2),
        "speedup": round(t_scan / t_probe, 1),
        "expansions_nonempty": sum(1 for s in probe if s),
        "host_health": health,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
