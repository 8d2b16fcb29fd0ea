"""Index compaction: physically drop tombstoned documents.

`compact_index` rewrites a built index WITHOUT its deleted documents,
equivalent to a fresh build over the surviving corpus (pinned by
tests/test_deletes.py and the driver's bm25_after_compact oracle):

  - surviving doc ids re-rank densely in old-id order — the engine's docid
    contract is the dense rank over sorted urls (ids.add_dense_index), and
    deletion preserves the survivors' relative order, so the new ids equal
    exactly what a fresh build over the surviving pages would assign;
  - the vocabulary re-ranks by the recomputed (df desc, term asc) and
    terms whose postings vanish drop out;
  - corpus statistics (N, avg_len, df -> BM25 weights) refresh — the
    post-compaction counterpart of delete_docs' stale-stats query
    semantics (see index.delete_docs);
  - DINT dictionaries re-learn from the surviving postings, so identical
    surviving postings produce byte-identical segments.

Implementation is decode -> reconstruct -> standard build (the shape of a
production engine's merge-with-deletes, e.g. Lucene's forceMergeDeletes):
the surviving corpus is reconstructed FROM THE INDEX ITSELF — the token
multiset of each doc from decoded (term, doc, freq) postings, or the exact
token sequence from the positions stream when the index is positional —
and fed through build_index's corpus_docs injection. Compaction therefore
reuses the whole one-pass build dataflow (salted skew split, per-bucket
resumable encode, lineage metrics) and costs one distributed decode plus
one standard build; no step materializes per-doc state on the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dint_spark.ids import add_dense_index
from dint_spark.index import Index, IndexConfig, build_index
from dint_spark.queries import decoded_positions, decoded_postings

# dataclass fields accepted by IndexConfig — manifests written by older
# builds may lack late-added knobs (fine: defaults apply) and must never
# carry unknown ones into the constructor
_CFG_FIELDS = set(IndexConfig.__dataclass_fields__)


def _clone_config(index: Index, num_buckets: int | None,
                  tag_prefix: str = "compact:") -> IndexConfig:
    d = {k: v for k, v in dict(index.manifest["config"]).items()
         if k in _CFG_FIELDS}
    d["input_tag"] = f"{tag_prefix}{d.get('input_tag', '')}"
    if num_buckets is not None:
        d["num_buckets"] = num_buckets
    return IndexConfig(**d)


def compact_index(spark: SparkSession, index: Index, out_dir: str,
                  num_buckets: int | None = None) -> Index:
    """Rewrite ``index`` at ``out_dir`` without its tombstoned documents.

    Returns the loaded compacted Index. Works on positional and
    non-positional indexes; with zero tombstones it degenerates to an
    identity rewrite (useful as a self-check). ``out_dir`` must be fresh —
    the rewrite is a normal resumable build there.
    """
    config = _clone_config(index, num_buckets)
    corpus = reconstruct_corpus(spark, index, config)
    return build_index(spark, None, out_dir, config, corpus_docs=corpus)


def reindex_index(spark: SparkSession, index: Index, out_dir: str,
                  token_transform=None,
                  num_buckets: int | None = None) -> Index:
    """The ES ``_reindex`` API: rebuild the index FROM ITSELF under a
    new analysis chain — no source corpus needed. Dataflow is
    compaction's reconstruct -> (per-token transform) -> standard
    resumable build; ``token_transform`` is a Column->Column over the
    token array (e.g. ``analyzer.analyzed_tokens`` for the stopword+
    S-stem chain). Because the transform is per-token, the multiset
    reconstruction is exact for non-positional indexes too — the result
    is pinned equal to a fresh build over the transformed corpus
    (tests/test_reindex.py, driver entry search_reindexed). Live docs
    only: tombstoned documents do not survive a reindex (same as ES,
    where _reindex copies live documents)."""
    config = _clone_config(index, num_buckets, tag_prefix="reindex:")
    corpus = reconstruct_corpus(spark, index, config)
    if token_transform is not None:
        corpus = corpus.select(
            "doc_id", token_transform(F.col("tokens")).alias("tokens"))
    return build_index(spark, None, out_dir, config, corpus_docs=corpus)


def reconstruct_corpus(spark: SparkSession, index: Index,
                       config: IndexConfig) -> DataFrame:
    """The surviving corpus as (doc_id, tokens), rebuilt from the index:
    compact_index's dataflow up to (but not including) the standard build.
    Exposed separately so the plan audit can assert its shape (broadcast
    left-anti tombstone filter, hash-join vocab attach, no cartesian)."""
    deleted = index.deleted_docs()
    del_df = (spark.createDataFrame([(int(d),) for d in deleted],
                                    "doc_id long")
              if len(deleted) else None)

    vocab = index.vocab().select("term_id", "term")
    if index.num_terms <= config.bc_max_terms:
        vocab = F.broadcast(vocab)

    if getattr(index, "has_positions", False):
        # exact token sequence per doc from the positions stream: every
        # token occurrence is one (term, pos) row, positions are dense
        # 0..len-1, so sorting by pos reconstructs the tokenizer's output
        occ = decoded_positions(index)
        if del_df is not None:
            occ = occ.join(F.broadcast(del_df), "doc_id", "left_anti")
        toks = (
            occ.join(vocab, "term_id")
            .groupBy("doc_id")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(pos, term))),"
                " x -> x.term)").alias("tokens"))
        )
    else:
        # token MULTISET per doc: order within a doc is irrelevant to every
        # non-positional build step (tf counts, doclens, vocab df), so the
        # rebuilt index is independent of collect_list's arrival order
        dec = decoded_postings(index)
        if del_df is not None:
            dec = dec.join(F.broadcast(del_df), "doc_id", "left_anti")
        toks = (
            dec.join(vocab, "term_id")
            .groupBy("doc_id")
            .agg(F.flatten(F.collect_list(F.expr(
                "array_repeat(term, cast(freq AS int))"))).alias("tokens"))
        )

    # dense survivor ranks in old-id order == fresh-build ids over the
    # surviving pages (deletion preserves the survivors' url-rank order)
    return add_dense_index(toks, [F.col("doc_id")], "new_doc_id").select(
        F.col("new_doc_id").alias("doc_id"), "tokens")
