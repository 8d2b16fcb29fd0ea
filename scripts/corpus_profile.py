"""Per-sub-step wall profile of the corpus phase (the build's dominant
phase at >=10^6 docs: tokenize -> dense ids -> doclens/vocab -> tf agg ->
postings assembly -> pbucket checkpoint).

Usage: python scripts/corpus_profile.py [num_docs] [master]

Replicates index.build_index's corpus step with a timer around every
Spark action so the phase's one manifest wall splits into its parts.
Numbers are for finding the dominant sub-step, not for cross-run
comparison (each action's timer includes its own job overhead).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dint_spark.corpus import generate_pages
from dint_spark.index import write_postings_checkpoint
from dint_spark.postings import build_postings, term_doc_freqs
from dint_spark.session import get_spark
from dint_spark.tokenizer import assign_doc_ids, build_vocab, doclens, tokenize


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local-cluster[2,8,16384]"
    spark = get_spark("corpus-profile", master=master,
                      shuffle_partitions=max(
                          16, int(os.environ.get("SPARK_GRAFT_CPUS", "16"))))
    out = f"/tmp/dint_corpus_profile/{num_docs}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    pages = generate_pages(spark, num_docs, seed=42)

    walls: dict[str, float] = {}

    def lap(name: str, fn):
        t0 = time.time()
        r = fn()
        walls[name] = round(time.time() - t0, 2)
        print(f"  {name}: {walls[name]}s", flush=True)
        return r

    t_all = time.time()
    # warmup: python worker pools + codegen
    def _noop(it):
        yield from it
    (spark.range(spark.sparkContext.defaultParallelism * 8)
     .repartition(spark.sparkContext.defaultParallelism * 2)
     .mapInPandas(_noop, "id long").count())

    # 1. dense ids: sort-by-url range shuffle + persist + per-pid counts
    docs_ids = lap("dense_ids(sort+persist+counts)", lambda: (
        assign_doc_ids(pages.select("url", "text"))))
    # 2. tokenize + persist the (doc_id, tokens) projection, materialized
    #    by the doclens write
    docs = tokenize(docs_ids).select("doc_id", "tokens").persist()
    dl = doclens(docs)
    lap("tokenize+doclens_write", lambda: dl.write.mode("overwrite")
        .parquet(f"{out}/doclens.parquet"))
    # 3. vocab (df agg + dense rank) + write
    vocab = build_vocab(docs)
    lap("vocab_build+write", lambda: vocab.write.mode("overwrite")
        .parquet(f"{out}/vocab.parquet"))
    dl2 = spark.read.parquet(f"{out}/doclens.parquet")
    vocab2 = spark.read.parquet(f"{out}/vocab.parquet")
    nt = vocab2.count()
    sum_len = dl2.agg(F.sum("len").alias("s")).collect()[0]["s"]
    # 4. tf aggregation (explode + partial/final hash agg + vocab join)
    hints = os.environ.get("CORPUS_PROFILE_HINTS", "1") == "1"
    tdf = term_doc_freqs(docs, vocab2,
                         num_terms_hint=int(nt) if hints else None).persist()
    lap("tf_agg(explode+agg+join)+persist", lambda: tdf.count())
    par0 = max(spark.sparkContext.defaultParallelism, 8)
    # 5. postings assembly: seg-map aggs + (term,seg) shuffle + sorted
    #    mapInPandas fold; materialized by the pbucket checkpoint write
    from dint_spark.postings import DEFAULT_SKEW_CHUNK
    postings = build_postings(
        tdf, dl2, num_partitions=par0,
        segmap_rows_hint=(int(nt) + int(sum_len) // DEFAULT_SKEW_CHUNK
                          if hints else None),
        num_docs_hint=num_docs if hints else None)
    lap("assembly+pbucket_write", lambda: write_postings_checkpoint(
        postings, f"{out}/postings.parquet", int(nt), 8, par0,
        pre_arranged=True))
    walls["TOTAL_corpus"] = round(time.time() - t_all, 2)
    print(walls)
    spark.stop()


if __name__ == "__main__":
    main()
