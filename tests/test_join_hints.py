"""The corpus-pass size hints only change JOIN STRATEGY, never results:
postings built with forced-broadcast dimension joins (vocab / doclens /
segmap) must equal the unhinted shuffle-join plan row for row."""

from pyspark.sql import functions as F

from dint_spark.corpus import generate_pages
from dint_spark.postings import build_postings, term_doc_freqs
from dint_spark.tokenizer import assign_doc_ids, build_vocab, doclens, tokenize


def _postings_rows(spark, hints: bool):
    pages = generate_pages(spark, 600, seed=11)
    docs = tokenize(assign_doc_ids(pages.select("url", "text"))
                    ).select("doc_id", "tokens").persist()
    dl = doclens(docs)
    vocab = build_vocab(docs)
    nt = vocab.count()
    sl = dl.agg(F.sum("len").alias("s")).collect()[0]["s"]
    tdf = term_doc_freqs(docs, vocab,
                         num_terms_hint=int(nt) if hints else None)
    # tiny seg/skew chunks so the segmap has multi-salt, multi-seg terms
    # and the hinted broadcast path is exercised beyond the trivial shape
    n_chunks = -(-600 // 64)
    p = build_postings(
        tdf, dl, skew_chunk=64, seg_chunk=128, num_partitions=4,
        segmap_rows_hint=(min(int(sl), int(nt) * n_chunks)
                          if hints else None),
        num_docs_hint=600 if hints else None)
    rows = sorted(
        (r["term_id"], r["seg_id"], tuple(r["doc_ids"]), tuple(r["freqs"]),
         tuple(r["lens"]))
        for r in p.collect())
    docs.unpersist()
    return rows


def test_hinted_postings_identical(spark):
    assert _postings_rows(spark, True) == _postings_rows(spark, False)


def test_bc_knobs_do_not_change_config_hash():
    """The broadcast ceilings are plan tuning, not output contract: lowering
    them must not invalidate resume of an existing index."""
    from dint_spark.index import IndexConfig

    assert (IndexConfig().config_hash()
            == IndexConfig(bc_max_terms=1, bc_max_docs=1,
                           bc_max_segmap_rows=0).config_hash())
