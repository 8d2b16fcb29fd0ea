"""Structured-Streaming ingestion + incremental compaction."""

import os

import pytest

from dint_spark.corpus import pages_from_documents
from dint_spark.index import IndexConfig, build_index
from dint_spark.queries import decoded_postings
from dint_spark.streaming import (
    compact,
    compact_incremental,
    stream_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")
def test_stream_ingest_and_incremental_compact(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    input_dir = str(tmp_path / "incoming")
    work_dir = str(tmp_path / "work")
    os.makedirs(input_dir)

    cfg = IndexConfig(num_buckets=2, input_tag="stream")

    # wave 1: docs 0-19 and 20-34 as two files (url order = doc_id order)
    pages_from_documents(docs.where("doc_id < 20")).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(input_dir, "w1"))
    pages_from_documents(
        docs.where("doc_id >= 20 and doc_id < 35")
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(input_dir, "w2"))

    n_total = docs.count()
    state = stream_ingest(spark, input_dir + "/*", work_dir)
    assert sum(b["rows"] for b in state["batches"].values()) == 35

    idx1 = compact(spark, work_dir, cfg)
    assert idx1.num_docs == 35

    # wave 2: the remaining docs arrive later (urls sort after wave 1's)
    pages_from_documents(docs.where("doc_id >= 35")).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(input_dir, "w3"))
    state = stream_ingest(spark, input_dir + "/*", work_dir)
    assert sum(b["rows"] for b in state["batches"].values()) == n_total

    idx2 = compact_incremental(spark, work_dir, cfg)
    assert idx2.num_docs == n_total

    # equivalence with the one-shot batch build over the full corpus
    full = build_index(
        spark, pages_from_documents(docs), str(tmp_path / "full"),
        IndexConfig(num_buckets=2, input_tag="full"),
    )
    key = ["term_id", "doc_id"]
    pi = decoded_postings(idx2).toPandas().sort_values(key).reset_index(drop=True)
    pf = decoded_postings(full).toPandas().sort_values(key).reset_index(drop=True)
    assert pi.equals(pf)

    # ingest with nothing new is a no-op generation-wise
    idx3 = compact_incremental(spark, work_dir, cfg)
    assert idx3.dir == idx2.dir


def test_stream_sessionize_incremental_out_of_order(spark, tmp_path):
    """applyInPandasWithState sessionizer: wave 2 arrives later and contains
    (a) extensions of live sessions, (b) a bridging event that MERGES two
    sessions that were separate after wave 1, (c) a brand-new user. The
    checkpoint-resumed second run must converge to exactly the batch
    result over the union."""
    import pandas as pd

    from dint_spark.streaming import (
        SESSION_GAP_S,
        run_sessionize_available_now,
    )

    inp = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    g = SESSION_GAP_S

    # user 1's wave-1 sessions end/start at 1100 and 2240 — 1.9g apart, so
    # they stay separate until the wave-2 event at 1650 lands within g of
    # BOTH (550 and 590) and bridges them
    wave1 = [(1, 1000), (1, 1100), (1, 2240), (2, 500)]
    wave2 = [(1, 1650), (2, 500 + g), (3, 42)]
    batch_expected = {
        1: [(1000, 2240, 4)],  # merged into ONE session
        2: [(500, 500 + g, 2)],
        3: [(42, 42, 1)],
    }

    def write(rows, name):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "tsec"]),
            "user_id bigint, tsec bigint",
        ).coalesce(1).write.parquet(f"{inp}/{name}")

    import os

    os.makedirs(inp)
    write(wave1, "w1")
    r1 = run_sessionize_available_now(spark, inp + "/*", ckpt)
    assert len(r1[r1.user_id == 1]) == 2  # two separate sessions so far

    write(wave2, "w2")
    r2 = run_sessionize_available_now(spark, inp + "/*", ckpt)
    got = {
        uid: [
            (int(r.session_start), int(r.session_end), int(r.n_events))
            for r in grp.itertuples()
        ]
        for uid, grp in r2.groupby("user_id")
    }
    # users untouched in run 2 keep their run-1 state: merge run1 for them
    for uid, grp in r1.groupby("user_id"):
        got.setdefault(
            uid,
            [
                (int(r.session_start), int(r.session_end), int(r.n_events))
                for r in grp.itertuples()
            ],
        )
    assert got == batch_expected


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")
def test_stream_ingest_epochs_equals_batch_append(spark, tmp_path):
    """Unified lifecycle (r3 VERDICT item 7): micro-batches committed as
    epoch shards through append_docs must be BIT-IDENTICAL to the same
    files applied as manual batch appends — same manifest shape, same
    vocabulary, same float top-k — and the streaming marker makes a
    replayed batch a no-op."""
    import time

    import numpy as np

    from dint_spark.sharding import (ShardedIndex, append_docs,
                                     build_sharded_index,
                                     run_queries_sharded)
    from dint_spark.streaming import stream_ingest_epochs

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    cuts = [(0, 20), (20, 35), (35, 10 ** 9)]
    for i, (lo, hi) in enumerate(cuts):
        p = os.path.join(input_dir, f"w{i}")
        pages_from_documents(
            docs.where(f"doc_id >= {lo} and doc_id < {hi}")
        ).coalesce(1).write.mode("overwrite").parquet(p)
        # file-stream batch order follows modification time: pin it
        for r, _, fs in os.walk(p):
            for f in fs:
                os.utime(os.path.join(r, f), (1e9 + i, 1e9 + i))
        time.sleep(0.01)

    cfg = IndexConfig(num_buckets=2, input_tag="sepoch")
    sidx = stream_ingest_epochs(spark, input_dir + "/*",
                                str(tmp_path / "work"), config=cfg,
                                max_files_per_trigger=1)
    assert len(sidx.shards) == 3
    assert int(sidx.manifest["stream_last_batch"]) == 2

    # the SAME files as manual batch appends
    man_dir = str(tmp_path / "manual")
    m = build_sharded_index(
        spark, spark.read.parquet(os.path.join(input_dir, "w0")),
        man_dir, num_shards=1, config=cfg)
    for i in (1, 2):
        m = append_docs(
            spark, m, spark.read.parquet(os.path.join(input_dir, f"w{i}")),
            config=cfg)

    assert sidx.num_docs == m.num_docs == docs.count()
    assert sidx.bases == m.bases
    sv = sidx.vocab().toPandas().sort_values("term_id").reset_index(drop=True)
    mv = m.vocab().toPandas().sort_values("term_id").reset_index(drop=True)
    assert sv.equals(mv)
    qs = [[0], [1, 3], [2, 5, 7]]
    a = run_queries_sharded(spark, sidx, qs, k=10).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = run_queries_sharded(spark, m, qs, k=10).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    assert np.array_equal(a.score.to_numpy(np.float32),
                          b.score.to_numpy(np.float32))

    # replayed batch id is a no-op (the exactly-once marker): re-running
    # the whole availableNow stream re-offers nothing new AND a stale
    # batch id is skipped by the manifest marker
    sidx2 = stream_ingest_epochs(spark, input_dir + "/*",
                                 str(tmp_path / "work"), config=cfg,
                                 max_files_per_trigger=1)
    assert len(sidx2.shards) == 3 and sidx2.num_docs == sidx.num_docs
