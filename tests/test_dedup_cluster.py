"""dedup_cluster property tests: transitive chains merge into one cluster
(the case pair-level dedup under-deletes), singletons are excluded, the
canonical survivor is the min doc_id, the hot-shingle df cap bounds the
pair join, and the two pair sources (exact jaccard / minhash-LSH) produce
identical clusters on a fixture corpus."""

import os

from dint_spark.ops.dedup import (
    dedup_cluster, dedup_ngram_jaccard)


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


def test_hot_shingle_df_cap(spark, tmp_path):
    """A boilerplate shingle shared by every doc must not generate n^2
    candidate pairs once its df exceeds the cap: with the cap below the
    boilerplate df the pairs (whose ONLY similarity is the boilerplate)
    disappear; with the cap above it they are found."""
    n = 10
    texts = [f"aa bb cc dd ee u{i:02d}" for i in range(n)]
    # per doc: shingles {aa bb cc, bb cc dd, cc dd ee, dd ee u_i};
    # any pair shares the 3 boilerplate shingles -> Jaccard 3/5 = 0.6
    sf = _write_documents(spark, tmp_path, texts)
    uncapped = dedup_ngram_jaccard(spark, sf, max_shingle_df=n).collect()
    assert len(uncapped) == n * (n - 1) // 2
    capped = dedup_ngram_jaccard(spark, sf, max_shingle_df=5).collect()
    assert capped == []


def test_pair_sources_give_identical_clusters(spark, tmp_path):
    """dedup_cluster(pair_source='minhash') — the crawl-scale feeder — must
    produce the same clusters as the exact jaccard pair graph wherever LSH
    recall is complete (near-identical docs collide in >= 1 band)."""
    base = [f"tok{i:02d}" for i in range(40)]
    texts = []
    for g in range(4):  # 4 clusters of 3 near-identical docs
        words = [f"g{g}_{w}" for w in base]
        texts.append(" ".join(words))
        texts.append(" ".join(words[1:]))
        texts.append(" ".join(words + ["extra"]))
    texts.append("totally unrelated filler text document nothing shared")
    sf = _write_documents(spark, tmp_path, texts)

    def clusters(src):
        return sorted(
            (r["doc_id"], r["cluster_id"], r["csize"], r["keep"])
            for r in dedup_cluster(spark, sf, pair_source=src).collect())

    cj = clusters("jaccard")
    cm = clusters("minhash")
    assert cj == cm
    assert len(cj) == 12  # every near-dup doc clustered, singleton absent
