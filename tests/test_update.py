"""update_docs (sharding.update_docs): the ES update-by-id lifecycle —
tombstone the superseded versions, append the replacements as an epoch.

Pinned laws:
  - equivalence: update_docs == delete_docs_sharded + append_docs run
    separately on a twin index (identical query rows);
  - the old versions never surface (their marker term retrieves only
    the un-updated doc), the new content retrieves;
  - layout: one new epoch, num_docs grows by the batch, tombstones
    stay shard-local.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dint_spark.corpus import generate_pages
from dint_spark.index import IndexConfig
from dint_spark.sharding import (append_docs, build_sharded_index,
                                 delete_docs_sharded, run_queries_sharded,
                                 update_docs)

N_DOCS = 300
UPDATED = [3, 57, 120, 211]       # global ids to supersede
OLD_MARK = "zzzoldversion"        # present in a 5th doc that is NOT updated
NEW_MARK = "zzznewversion"


def _pages(spark):
    pages = generate_pages(spark, N_DOCS, seed=23)
    # doc id = url rank; salt ids UPDATED + [250] with the old marker
    urls = [r["url"] for r in
            pages.select("url").orderBy("url").collect()]
    marked = [urls[i] for i in UPDATED + [250]]
    return pages.withColumn(
        "text",
        F.when(F.col("url").isin(marked),
               F.concat_ws(" ", "text", F.lit(OLD_MARK)))
        .otherwise(F.col("text")))


def _new_pages(spark):
    return (generate_pages(spark, 4, seed=77)
            .withColumn("url", F.concat(F.lit("zz-upd-"), "url"))
            .withColumn("text", F.concat_ws(
                " ", "text", F.lit(NEW_MARK))))


def _rows(sidx, spark, specs):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in run_queries_sharded(
            spark, sidx, specs, algo="block_max_wand", k=10).collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = IndexConfig(num_buckets=2, input_tag="upd")
    base = tmp_path_factory.mktemp("upd")
    pages = _pages(spark).persist()
    new = _new_pages(spark).persist()
    a = build_sharded_index(spark, pages, str(base / "a"), num_shards=1,
                            config=cfg)
    b = build_sharded_index(spark, pages, str(base / "b"), num_shards=1,
                            config=cfg)
    a2 = update_docs(spark, a, UPDATED, new, config=cfg)
    delete_docs_sharded(spark, b, UPDATED)
    b2 = append_docs(spark, b, new, config=cfg)
    return a2, b2


def _tids(sidx, words):
    rows = (sidx.vocab().where(F.col("term").isin(words))
            .select("term", "term_id").collect())
    return {r["term"]: int(r["term_id"]) for r in rows}


def test_update_equals_delete_plus_append(built, spark):
    a2, b2 = built
    tid = _tids(a2, [OLD_MARK, NEW_MARK])
    # term_id 0 = the corpus's most frequent term (head-term query)
    specs = [[tid[OLD_MARK]], [tid[NEW_MARK]], [0]]
    assert _rows(a2, spark, specs) == _rows(b2, spark, specs)


def test_old_versions_masked_new_content_live(built, spark):
    a2, _ = built
    tid = _tids(a2, [OLD_MARK, NEW_MARK])
    old_hits = {r[2] for r in _rows(a2, spark, [[tid[OLD_MARK]]])}
    # the marker survives ONLY in the un-updated doc 250
    assert old_hits == {250}
    new_hits = {r[2] for r in _rows(a2, spark, [[tid[NEW_MARK]]])}
    assert new_hits == set(range(N_DOCS, N_DOCS + 4))


def test_update_layout(built):
    a2, _ = built
    assert len(a2.shards) == 2
    assert a2.num_docs == N_DOCS + 4
