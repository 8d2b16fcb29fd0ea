"""dedup_cluster property tests: transitive chains merge into one cluster
(the case pair-level dedup under-deletes), singletons are excluded, and the
canonical survivor is the min doc_id."""

import os

from dint_spark.ops.dedup import dedup_cluster


def _write_documents(spark, tmp_path, texts):
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def test_chain_merges_and_singleton_excluded(spark, tmp_path):
    # doc0 ~ doc1 and doc1 ~ doc2 (adjacent Jaccard >= 0.5) but
    # doc0 vs doc2 falls below the pair threshold: a pair-level dedup
    # keeps doc2; the cluster op must collapse all three.
    base = [f"tok{i:02d}" for i in range(12)]
    texts = [
        " ".join(base),
        " ".join(base[2:] + ["xx aa bb"]),
        " ".join(base[4:] + ["xx aa bb", "yy cc dd"]),
        "entirely different words here nothing shared at all zz",
    ]
    sf = _write_documents(spark, tmp_path, texts)
    out = {
        r["doc_id"]: (r["cluster_id"], r["csize"], r["keep"])
        for r in dedup_cluster(spark, sf).collect()
    }
    assert set(out) == {0, 1, 2}  # doc3 is a singleton: no row
    assert out[0] == (0, 3, 1)
    assert out[1] == (0, 3, 0)
    assert out[2] == (0, 3, 0)
