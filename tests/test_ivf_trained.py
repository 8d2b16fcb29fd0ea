"""k-means-refined IVF (ann_ivf_trained_topk): on a CLUSTERED embedding
fixture the trained coarse quantizer must beat the static modulo
quantizer's recall@10 against the exact brute-force oracle, and the whole
pipeline must be deterministic across runs (the driver-gate contract for
oracle-less entries)."""

import os

import numpy as np

from dint_spark.ops.similarity import (
    TOPK, ann_cosine_topk, ann_ivf_topk, ann_ivf_trained_topk)


def _write_clustered_embeddings(spark, tmp_path, n=1480, k=40, dim=64,
                                seed=7):
    """k tight gaussian clusters — the shape where a data-adaptive
    quantizer matters (the isotropic sf fixtures floor every ANN method)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, k, size=n)
    vecs = centers[lab] + 0.05 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]], int(lab[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path)
    df.coalesce(2).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))
    return out


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    return hits / (len(exact) * TOPK)


def test_trained_ivf_beats_static_and_is_deterministic(spark, tmp_path):
    sf = _write_clustered_embeddings(spark, tmp_path)
    exact = _topk_sets(ann_cosine_topk(spark, sf))
    static = _recall(_topk_sets(ann_ivf_topk(spark, sf)), exact)
    t1 = ann_ivf_trained_topk(spark, sf).collect()
    trained = _recall(_topk_sets_rows(t1), exact)
    # deterministic fixture + deterministic pipeline: on this corpus the
    # static modulo quantizer loses queries whose cluster straddles a cell
    # boundary (0.953 measured) while 2 Lloyd rounds align cells to the
    # true clusters (1.0)
    assert trained > static, (trained, static)
    assert trained >= 0.95  # tight clusters: trained cells ~= true clusters
    # determinism: identical rows on a re-run (rows-only gate contract)
    t2 = ann_ivf_trained_topk(spark, sf).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, t1), key=lambda t: t[:2]) == sorted(
        map(tuple, t2), key=lambda t: t[:2])


def _topk_sets_rows(rows) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return out


def test_kmeans_par_init_beats_static_and_is_deterministic(spark, tmp_path):
    """The k-means|| parallel-sampling init (the 10^9-vector path —
    replaces nlist sequential k-means++ draws with a few whole-corpus
    rounds): on the clustered fixture, trained recall from the
    kmeans_par init must beat the static quantizer and be deterministic
    across runs (hash-variate sampling + fixed-seed driver reduction)."""
    sf = _write_clustered_embeddings(spark, tmp_path)
    exact = _topk_sets(ann_cosine_topk(spark, sf))
    static = _recall(_topk_sets(ann_ivf_topk(spark, sf)), exact)
    t1 = ann_ivf_trained_topk(spark, sf, init="kmeans_par").collect()
    trained = _recall(_topk_sets_rows(t1), exact)
    assert trained > static, (trained, static)
    assert trained >= 0.95
    t2 = ann_ivf_trained_topk(spark, sf, init="kmeans_par").collect()
    assert sorted(map(tuple, t1), key=lambda t: t[:2]) == sorted(
        map(tuple, t2), key=lambda t: t[:2])
