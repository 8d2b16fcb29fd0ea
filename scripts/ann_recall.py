"""Recall@k of the approximate ANN paths vs the exact brute-force baseline.

ann_lsh_topk (multi-probe hyperplane LSH) and ann_ivf_topk (inverted-file
cells) trade recall for touching a fraction of the corpus; this script
measures that trade honestly: recall@10 per query = |approx top-10 ∩ exact
top-10| / 10, reported as mean and p10 across the query set, plus the
candidate-set fraction actually scored (the scan-saving).

Usage: python scripts/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dint_spark.session import get_spark  # noqa: E402


def recall(approx, exact, k=10):
    ex = exact.groupby("query_id")["vec_id"].apply(set)
    ap = approx.groupby("query_id")["vec_id"].apply(set)
    per_q = []
    for qid, truth in ex.items():
        got = ap.get(qid, set())
        per_q.append(len(got & truth) / min(k, len(truth)))
    import numpy as np

    a = np.array(per_q)
    return {"mean": round(float(a.mean()), 4),
            "p10": round(float(np.percentile(a, 10)), 4),
            "n_queries": len(per_q)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_recall", master="local[16]", shuffle_partitions=16)
    from dint_spark.ops.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
        ann_lsh_topk,
    )

    import numpy as np

    from dint_spark.ops.similarity import (
        CENT_MOD,
        NPROBE,
        PROBE_HAMMING,
        QUERY_MOD,
        _emb_q,
        _lsh_buckets,
    )

    exact = ann_cosine_topk(spark, sf_dir).toPandas()
    n_vecs = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).count()
    out = {"sf_dir": sf_dir, "n_vectors": n_vecs}

    # candidate fraction actually scored (the scan saving) — derived from
    # the same bucket/cell structures the ops join on
    eqs = _emb_q(spark, sf_dir).cache()
    bk = _lsh_buckets(spark, eqs).toPandas()
    b = bk["bucket"].to_numpy()
    qb = bk[bk["vec_id"] % QUERY_MOD == 0]["bucket"].to_numpy()
    x = qb[:, None] ^ b[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        ham += x & 1
        x >>= 1
    lsh_frac = float((ham <= PROBE_HAMMING).mean())

    from dint_spark.ops.similarity import ann_ivf_topk as _ivf  # noqa: F401
    # IVF fraction: probed-cell population / corpus, via the op's own
    # assignment rule (nearest centroid by quantized cosine)
    import pandas as pd
    from pyspark.sql import functions as F

    cents = eqs.where(F.col("vec_id") % CENT_MOD == 1).toPandas()
    allv = eqs.toPandas()
    C = np.stack(cents["eq"].to_numpy()).astype(np.float64)
    V = np.stack(allv["eq"].to_numpy()).astype(np.float64)
    cn = np.sqrt(cents["n2"].to_numpy().astype(np.float64))
    vn = np.sqrt(allv["n2"].to_numpy().astype(np.float64))
    cos = (V @ C.T) / (vn[:, None] * cn[None, :])
    order = np.argsort(-np.round(cos * 1e6), axis=1, kind="stable")
    cell = cents["vec_id"].to_numpy()[order[:, 0]]
    sizes = pd.Series(cell).value_counts()
    qmask = allv["vec_id"].to_numpy() % QUERY_MOD == 0
    probed = cents["vec_id"].to_numpy()[order[qmask, :NPROBE]]
    ivf_frac = float(
        sum(sizes.get(c, 0) for row in probed for c in row)
        / (qmask.sum() * n_vecs)
    )

    from dint_spark.ops.similarity import ann_ivf_trained_topk

    for name, fn, frac in [("ann_lsh_topk", ann_lsh_topk, lsh_frac),
                           ("ann_ivf_topk", ann_ivf_topk, ivf_frac),
                           ("ann_ivf_trained_topk", ann_ivf_trained_topk,
                            None)]:
        pdf = fn(spark, sf_dir).toPandas()
        r = recall(pdf, exact)
        if frac is not None:
            r["corpus_fraction_scored"] = round(frac, 4)
        out[name] = r
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
