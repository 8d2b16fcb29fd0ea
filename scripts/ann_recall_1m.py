"""ANN recall@10-vs-cost at >=1M vectors (round-4 VERDICT item 8).

Builds a deterministic clustered 1M x 64 fixture (2000 gaussian clusters
— the shape where a data-adaptive quantizer matters), trains the IVF
coarse quantizer with the BLAS-batched assignment (the 10^6+ path;
argmax-identical to the JVM form, pinned in tests/test_ann_blas.py),
and reports:

  * recall@10 (mean, p10) vs the exact matmul-batched brute force, per
    nprobe in {1,2,4,8,16,32,64}, with the corpus fraction scanned and
    the search wall per point — the cost axis;
  * the auto-selected nprobe (smallest with mean recall >= 0.9 — the
    ivf_auto_nprobe rule);
  * the k-means|| (Bahmani VLDB'12) init arm, trained on a 1/20
    deterministic subsample per the ivf_train_centroids 10^9 recipe
    (full-corpus assignment stays exact);
  * multi-probe LSH recall + fraction at the same query sample.

Queries: vec_id % QUERY_SAMPLE_MOD == 0 (200 queries at 1M). The module
QUERY_MOD (=50, gate-scale) is overridden for the LSH arm so its plan
samples the same 200 queries.

Usage: python scripts/ann_recall_1m.py [n_vectors] [nlist]
Writes ann_recall_1m_result.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from dint_spark.session import get_spark  # noqa: E402

N_CLUSTERS = 2000
DIM = 64
NOISE = 0.08
QUERY_SAMPLE_MOD = 5000
NPROBES = [1, 2, 4, 8, 16, 32, 64]
TARGET_RECALL = 0.9
KPAR_SAMPLE_MOD = 20


def build_fixture(spark, n: int, out: str, seed: int = 4242) -> None:
    """Deterministic regardless of partitioning: per-vector rng keyed by
    (seed, vec_id); labels mix vec_id through a Weyl constant."""
    if os.path.exists(os.path.join(out, "embeddings.parquet", "_SUCCESS")):
        return
    centers = np.random.default_rng(seed).normal(
        size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lab = (ids * 2654435761) % N_CLUSTERS
            vecs = np.empty((len(ids), DIM), dtype=np.float64)
            for i, vid in enumerate(ids):
                rng = np.random.default_rng([seed, int(vid)])
                vecs[i] = C[lab[i]] + NOISE * rng.normal(size=DIM)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [v.astype(np.float32) for v in vecs],
                "label": lab.astype(np.int32),
            })

    (spark.range(n).repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int")
     .write.mode("overwrite")
     .parquet(os.path.join(out, "embeddings.parquet")))


def recall_stats(approx_pdf, truth) -> dict:
    ap = approx_pdf.groupby("query_id")["vec_id"].apply(set)
    per_q = np.array([
        len(ap.get(qid, set()) & t) / min(10, len(t))
        for qid, t in truth.items()])
    return {"recall_mean": round(float(per_q.mean()), 4),
            "recall_p10": round(float(np.percentile(per_q, 10)), 4)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    out_json = os.path.join(REPO, "ann_recall_1m_result.json")
    sf_dir = f"/tmp/ann1m_{n}"

    spark = get_spark("ann_recall_1m", master="local[32]",
                      shuffle_partitions=64)
    import dint_spark.ops.similarity as S

    res: dict = {"n_vectors": n, "nlist": nlist, "dim": DIM,
                 "n_clusters": N_CLUSTERS,
                 "query_sample_mod": QUERY_SAMPLE_MOD}
    t0 = time.time()
    build_fixture(spark, n, sf_dir)
    res["fixture_s"] = round(time.time() - t0, 1)

    eqs = S._emb_q(spark, sf_dir).cache()
    eqs.count()

    # exact baseline (matmul-batched brute force over the full corpus)
    t0 = time.time()
    exact = S.exact_topk_blas(eqs, query_mod=QUERY_SAMPLE_MOD).toPandas()
    truth = exact.groupby("query_id")["vec_id"].apply(set)
    res["exact_s"] = round(time.time() - t0, 1)
    res["n_queries"] = int(len(truth))

    qs = eqs.where(F.col("vec_id") % QUERY_SAMPLE_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("eq").alias("q_eq"),
        F.col("n2").alias("q_n2"))

    def curve_for(cents, tag: str) -> None:
        t0 = time.time()
        assigned = S.assign_cells_blas(eqs, cents).cache()
        sizes = {r["cell"]: r["n"] for r in
                 assigned.groupBy("cell").agg(
                     F.count("*").alias("n")).collect()}
        res[f"{tag}_assign_s"] = round(time.time() - t0, 1)
        res[f"{tag}_cells"] = len(sizes)
        probes = S.probe_cells_blas(qs, cents, max(NPROBES)).cache()
        ppdf = probes.select("query_id", "cell", "pr").toPandas()
        curve = []
        for p in NPROBES:
            t0 = time.time()
            got = S._ivf_rerank(assigned,
                                probes.where(F.col("pr") <= p)).toPandas()
            wall = round(time.time() - t0, 2)
            sel = ppdf[ppdf["pr"] <= p]
            frac = float(sum(sizes.get(c, 0) for c in sel["cell"])
                         / (len(truth) * n))
            row = {"nprobe": p, **recall_stats(got, truth),
                   "corpus_fraction_scored": round(frac, 5),
                   "search_wall_s": wall}
            curve.append(row)
            print(f"{tag} nprobe={p} -> {row}", flush=True)
        res[f"{tag}_curve"] = curve
        chosen = next((c["nprobe"] for c in curve
                       if c["recall_mean"] >= TARGET_RECALL), None)
        res[f"{tag}_auto_nprobe@{TARGET_RECALL}"] = chosen
        assigned.unpersist()
        probes.unpersist()

    # arm 1: mod-seeded + 2 Lloyd rounds, BLAS assignment end-to-end
    t0 = time.time()
    cents = S.ivf_train_centroids(eqs, iters=2, cent_mod=max(1, n // nlist),
                                  assign="blas")
    res["train_s"] = round(time.time() - t0, 1)
    curve_for(cents, "ivf_trained")

    # arm 2: k-means|| init over the FULL 1M corpus (blas min-distance
    # rounds — the 10^9-vector init path exercised at 10^6 for real),
    # one Lloyd round, blas assignment end-to-end
    t0 = time.time()
    cents_kpf = S.ivf_train_centroids(
        eqs, iters=1, init="kmeans_par", assign="blas", nlist=nlist)
    res["kmeans_par_full_train_s"] = round(time.time() - t0, 1)
    curve_for(cents_kpf, "ivf_kmeans_par_full")

    # arm 3: the same init on a deterministic 1/KPAR_SAMPLE_MOD
    # subsample (the documented beyond-memory recipe), Lloyd on the
    # sample, full-corpus assignment exact
    t0 = time.time()
    sample = eqs.where(F.col("vec_id") % KPAR_SAMPLE_MOD == 0).cache()
    n_sample = sample.count()
    cents_kp = S.ivf_train_centroids(
        sample, iters=1, init="kmeans_par", assign="blas", nlist=nlist)
    res["kmeans_par_train_s"] = round(time.time() - t0, 1)
    res["kmeans_par_sample"] = int(n_sample)
    curve_for(cents_kp, "ivf_kmeans_par")
    sample.unpersist()

    # arm 4: multi-probe LSH at the same query sample (QUERY_MOD override
    # so the op's plan samples the 200 queries, not 20k)
    t0 = time.time()
    old_qm = S.QUERY_MOD
    S.QUERY_MOD = QUERY_SAMPLE_MOD
    try:
        lsh = S.ann_lsh_topk(spark, sf_dir).toPandas()
    finally:
        S.QUERY_MOD = old_qm
    lsh_wall = round(time.time() - t0, 1)
    bk = S._lsh_buckets(spark, eqs).toPandas()
    b = bk["bucket"].to_numpy().astype(np.int64)
    qb = bk[bk["vec_id"] % QUERY_SAMPLE_MOD == 0]["bucket"].to_numpy()
    x = qb[:, None] ^ b[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        ham += x & 1
        x >>= 1
    res["ann_lsh"] = {**recall_stats(lsh, truth),
                      "corpus_fraction_scored":
                          round(float((ham <= S.PROBE_HAMMING).mean()), 5),
                      "search_wall_s": lsh_wall}
    print("ann_lsh ->", res["ann_lsh"], flush=True)

    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("->", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
