"""Index merging: combine two built indexes (or postings tables) into one
globally sorted term-partitioned index.

This is the reference's ordered merge of sub-indexes
(include/dint/dict_freq_index.hpp:119-122, semiasync_queue commit ordering)
lifted to whole-index granularity, expressed as Spark sort-merge shuffle:

  merge_postings   array-level merge of two postings tables sharing one
                   term-id space (doc collisions sum tf)
  merge_indexes    full merge of two independently built indexes over
                   DISJOINT corpora: unify vocabularies (term ids re-ranked
                   by combined df), offset the right index's doc ids, merge
                   posting arrays, then resume the standard build pipeline
                   (dict learn + encode) over the merged corpus files.

Merging N indexes = folding merge_indexes; each merge is one join-shuffle on
term strings + one term-range write. If both inputs were built from
url-sorted halves of one corpus, the merged index is byte-equivalent to the
single-shot build (asserted in tests/test_merge.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.ids import add_dense_index
from dint_spark.index import (Index, IndexConfig, build_index,
                              write_postings_checkpoint)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("seg_id", T.LongType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("doc_ids", T.ArrayType(T.LongType()), False),
        T.StructField("freqs", T.ArrayType(T.LongType()), False),
        T.StructField("lens", T.ArrayType(T.LongType()), False),
    ]
)


def _merge_arrays(da, fa, la, db, fb, lb):
    """Two-way sorted merge; duplicate doc -> tf summed, len must agree."""
    docs = np.concatenate([da, db])
    freqs = np.concatenate([fa, fb])
    lens = np.concatenate([la, lb])
    order = np.argsort(docs, kind="stable")
    docs, freqs, lens = docs[order], freqs[order], lens[order]
    if len(docs) > 1:
        dup = np.flatnonzero(docs[1:] == docs[:-1])
        if len(dup):
            np.add.at(freqs, dup, freqs[dup + 1])
            keep = np.ones(len(docs), dtype=bool)
            keep[dup + 1] = False
            docs, freqs, lens = docs[keep], freqs[keep], lens[keep]
    return docs, freqs, lens


def _with_seg(p: DataFrame, side: int) -> DataFrame:
    seg = F.col("seg_id") if "seg_id" in p.columns else F.lit(0).cast("long")
    return p.select(
        "term_id", F.lit(side).alias("side"), seg.alias("seg_id"),
        "doc_ids", "freqs", "lens",
    )


def merge_postings(pa: DataFrame, pb: DataFrame,
                   seg_chunk: int | None = None) -> DataFrame:
    """Merge two postings tables over the SAME term-id space; doc collisions
    sum tf. Accepts chunked inputs (multiple seg rows per term, disjoint
    increasing doc ranges) and emits chunked output rows of <= seg_chunk
    postings. One shuffle (groupBy term); each term's chunks are
    concatenated per side (already sorted) and two-way merged in numpy.
    NB: a head term is transiently materialized in one task here — for
    disjoint doc ranges at 10^12-doc scale use the docid-sharded build,
    where sub-indexes concatenate without a merge."""
    from dint_spark.postings import DEFAULT_SEG_CHUNK

    seg_chunk = seg_chunk or DEFAULT_SEG_CHUNK
    both = _with_seg(pa, 0).unionByName(_with_seg(pb, 1))
    grouped = both.groupBy("term_id").agg(
        F.sort_array(
            F.collect_list(F.struct("side", "seg_id", "doc_ids", "freqs", "lens"))
        ).alias("parts")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = np.empty(0, dtype=np.int64)

        def side_arrays(parts, side):
            sel = [p for p in parts if p["side"] == side]  # seg_id asc
            if not sel:
                return empty, empty, empty
            return tuple(
                np.concatenate([np.asarray(p[k], dtype=np.int64) for p in sel])
                for k in ("doc_ids", "freqs", "lens")
            )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                da, fa, la = side_arrays(r.parts, 0)
                db, fb, lb = side_arrays(r.parts, 1)
                docs, freqs, lens = _merge_arrays(da, fa, la, db, fb, lb)
                for si, lo in enumerate(range(0, max(len(docs), 1), seg_chunk)):
                    hi = min(lo + seg_chunk, len(docs))
                    rows.append(
                        (int(r.term_id), si, hi - lo, docs[lo:hi].tolist(),
                         freqs[lo:hi].tolist(), lens[lo:hi].tolist())
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["term_id", "seg_id", "df", "doc_ids", "freqs",
                             "lens"],
                )

    return grouped.mapInPandas(run, schema=POSTINGS_SCHEMA)


def _remap_postings(postings: DataFrame, vocab_old: DataFrame,
                    vocab_new: DataFrame, doc_offset: int) -> DataFrame:
    """Map term ids old->new via term strings; shift doc ids by doc_offset."""
    mapping = (
        vocab_old.select("term", F.col("term_id").alias("old_id"))
        .join(vocab_new.select("term", F.col("term_id").alias("new_id")), "term")
        .select("old_id", "new_id")
    )
    p = postings.join(
        F.broadcast(mapping), postings.term_id == mapping.old_id
    )
    shift = F.transform("doc_ids", lambda d: d + F.lit(doc_offset))
    seg = F.col("seg_id") if "seg_id" in postings.columns else F.lit(0)
    return p.select(
        F.col("new_id").alias("term_id"),
        seg.cast("long").alias("seg_id"),
        shift.alias("doc_ids"),
        "freqs",
        "lens",
    )


def merge_indexes(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    out_dir: str,
    config: IndexConfig | None = None,
) -> Index:
    """Merge two built indexes over disjoint corpora into a fresh index at
    out_dir. Vocabularies are unified (term ids re-ranked by combined df,
    ties term asc — the same total order as build_vocab); index B's doc ids
    are offset by A's num_docs; the standard resumable build pipeline then
    learns dictionaries and encodes segments from the merged corpus files."""
    config = config or IndexConfig()
    ia, ib = Index(spark, dir_a), Index(spark, dir_b)
    os.makedirs(out_dir, exist_ok=True)
    offset = ia.num_docs

    # ---- unified vocab: combined df, same (df desc, term asc) dense rank --
    from dint_spark.index import vocab_ensure_ttf
    va = vocab_ensure_ttf(
        spark, ia.vocab(), [os.path.join(dir_a, "postings.parquet")]
    ).select("term", "df", "ttf")
    vb = vocab_ensure_ttf(
        spark, ib.vocab(), [os.path.join(dir_b, "postings.parquet")]
    ).select("term", "df", "ttf")
    combined = (
        va.unionByName(vb).groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    )
    vocab = add_dense_index(
        combined, [F.col("df").desc(), F.col("term").asc()], "term_id"
    )
    vocab.write.mode("overwrite").parquet(os.path.join(out_dir, "vocab.parquet"))
    vocab = spark.read.parquet(os.path.join(out_dir, "vocab.parquet"))

    # ---- doclens: B shifted after A ---------------------------------------
    dla = spark.read.parquet(os.path.join(dir_a, "doclens.parquet"))
    dlb = spark.read.parquet(os.path.join(dir_b, "doclens.parquet"))
    dl = dla.unionByName(
        dlb.select((F.col("doc_id") + offset).alias("doc_id"), "len")
    )
    dl_obs = Observation()
    dl = dl.observe(dl_obs, F.count(F.lit(1)).alias("n"),
                    F.sum("len").alias("s"))
    dl.write.mode("overwrite").parquet(os.path.join(out_dir, "doclens.parquet"))

    # ---- postings: remap term ids, offset B docs, sorted-array merge ------
    pa = _remap_postings(
        spark.read.parquet(os.path.join(dir_a, "postings.parquet")),
        ia.vocab(), vocab, 0,
    )
    pb = _remap_postings(
        spark.read.parquet(os.path.join(dir_b, "postings.parquet")),
        ib.vocab(), vocab, offset,
    )
    merged = merge_postings(pa, pb)
    # same deterministic pbucket layout + observe-on-write as the primary
    # build: merged indexes get per-bucket partition pruning and a
    # manifest-complete corpus step (no re-derivation jobs on resume)
    num_terms = vocab.count()
    total_postings = write_postings_checkpoint(
        merged, os.path.join(out_dir, "postings.parquet"), num_terms,
        config.num_buckets,
        max(spark.sparkContext.defaultParallelism, config.num_buckets))

    # ---- resume the standard pipeline from the corpus checkpoint ----------
    from dataclasses import asdict

    manifest = {
        "config": asdict(config),
        "config_hash": config.config_hash(),
        "steps": {
            "corpus": {
                "ts": time.time(),
                "merged_from": [os.path.abspath(dir_a), os.path.abspath(dir_b)],
                "num_terms": int(num_terms),
                "num_docs": int(dl_obs.get["n"]),
                "sum_len": int(dl_obs.get["s"]),
                "total_postings": int(total_postings),
            }
        },
        "buckets": {},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    # pages=None is safe: the corpus step is already checkpointed
    return build_index(spark, None, out_dir, config)
