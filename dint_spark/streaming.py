"""Structured-Streaming ingestion + incremental index maintenance.

The reference is batch-only; this module adds the streaming front door a
production 10^12-doc pipeline needs, composed from the existing batch
engine:

  stream_ingest   readStream over a pages directory -> foreachBatch writes
                  idempotent staged batches (exactly-once via the streaming
                  checkpoint + overwrite-by-batch-id), maintaining a tiny
                  JSON state file (batch count, row counts, lineage)
  compact         build (or rebuild) the index over everything staged so
                  far — the batch pipeline is already resumable, so
                  compaction after more batches re-runs only what changed
                  fully when the corpus grew (corpus-derived steps)
  compact_incremental
                  delta path: build a small index over ONLY the new batches
                  and merge_indexes it with the existing one — the
                  streaming analogue of the reference's sub-index merge

Watermarks/stateful operators are not needed for index build (it is an
append-only accumulation); event-time correctness is by batch lineage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from dint_spark.corpus import PAGES_SCHEMA
from dint_spark.index import Index, IndexConfig, build_index
from dint_spark.merge import merge_indexes


def _state_path(work_dir: str) -> str:
    return os.path.join(work_dir, "ingest_state.json")


def _load_state(work_dir: str) -> dict:
    p = _state_path(work_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"batches": {}, "compacted_batches": [], "generation": 0}


def _save_state(work_dir: str, state: dict) -> None:
    tmp = _state_path(work_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, _state_path(work_dir))


def stream_ingest(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Ingest pages parquet files appearing under input_path into staged
    batches at work_dir/staged/batch=N. Returns the updated state."""
    os.makedirs(work_dir, exist_ok=True)
    state = _load_state(work_dir)

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def sink(batch_df, batch_id: int) -> None:
        out = os.path.join(work_dir, "staged", f"batch={batch_id}")
        # overwrite => idempotent on retry; checkpoint => exactly-once ids
        batch_df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        st = _load_state(work_dir)
        st["batches"][str(batch_id)] = {"rows": int(n), "ts": time.time()}
        _save_state(work_dir, st)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
    return _load_state(work_dir)


def _staged_pages(spark: SparkSession, work_dir: str, batch_ids: list[str]):
    paths = [
        os.path.join(work_dir, "staged", f"batch={b}") for b in sorted(
            batch_ids, key=int
        )
    ]
    return spark.read.parquet(*paths)


def compact(
    spark: SparkSession, work_dir: str, config: IndexConfig | None = None
) -> Index:
    """Full compaction: build the index over every staged batch. Writes to a
    fresh generation dir so readers of the previous index are unaffected
    (atomic cutover via state.generation)."""
    state = _load_state(work_dir)
    batch_ids = list(state["batches"].keys())
    if not batch_ids:
        raise ValueError("nothing staged to compact")
    gen = state["generation"] + 1
    out = os.path.join(work_dir, f"index-gen{gen}")
    pages = _staged_pages(spark, work_dir, batch_ids)
    cfg = config or IndexConfig(input_tag=f"stream-gen{gen}")
    idx = build_index(spark, pages, out, cfg)
    state["generation"] = gen
    state["compacted_batches"] = sorted(batch_ids, key=int)
    _save_state(work_dir, state)
    return idx


def compact_incremental(
    spark: SparkSession, work_dir: str, config: IndexConfig | None = None
) -> Index:
    """Delta compaction: index only the batches staged since the last
    compaction, then merge with the existing index (sub-index merge)."""
    state = _load_state(work_dir)
    prev_gen = state["generation"]
    done = set(state["compacted_batches"])
    new_ids = [b for b in state["batches"] if b not in done]
    if prev_gen == 0 or not done:
        return compact(spark, work_dir, config)
    if not new_ids:
        return Index(spark, os.path.join(work_dir, f"index-gen{prev_gen}"))

    gen = prev_gen + 1
    delta_dir = os.path.join(work_dir, f"delta-gen{gen}")
    cfg = config or IndexConfig(input_tag=f"stream-gen{gen}")
    from dataclasses import replace

    delta_cfg = replace(cfg, input_tag=f"{cfg.input_tag}-delta")
    build_index(
        spark, _staged_pages(spark, work_dir, new_ids), delta_dir, delta_cfg
    )
    out = os.path.join(work_dir, f"index-gen{gen}")
    idx = merge_indexes(
        spark,
        os.path.join(work_dir, f"index-gen{prev_gen}"),
        delta_dir,
        out,
        cfg,
    )
    state["generation"] = gen
    state["compacted_batches"] = sorted(done | set(new_ids), key=int)
    _save_state(work_dir, state)
    return idx


def stream_ingest_epochs(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    config: IndexConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming ingestion UNIFIED with the epoch maintenance lifecycle
    (round-3 follow-up): every micro-batch of pages commits as ONE epoch
    shard through sharding.append_docs — the exact append path batch
    callers use, with its verified cross-epoch BM25 exactness — so a
    stream-built index IS a batch-appended index, bit-identical per
    batch boundary (pinned by tests/test_streaming.py). The first batch
    bootstraps a single-shard index via build_sharded_index; readers can
    query the index under ``work_dir``/index between micro-batches (the
    manifest commit is atomic).

    Exactly-once: the streaming checkpoint fixes micro-batch ids, and
    append_docs records ``stream_last_batch`` inside its OWN atomic
    manifest commit (extra_manifest) — a foreachBatch retry of an
    already-committed batch id is a no-op, so a crash between epoch
    commit and checkpoint ack cannot double-append. Returns the final
    ShardedIndex (availableNow mode) or the streaming query handle.

    This supersedes the staged-batch + merge path (stream_ingest /
    compact_incremental, kept for the full-rebuild compaction story):
    one lifecycle — append epochs, tombstone deletes, compact — now
    serves batch and streaming identically (README "Maintenance").
    """
    from dint_spark.corpus import PAGES_SCHEMA
    from dint_spark.sharding import (SHARD_MANIFEST, ShardedIndex,
                                     append_docs, build_sharded_index)

    os.makedirs(work_dir, exist_ok=True)
    idx_dir = os.path.join(work_dir, "index")
    cfg = config or IndexConfig(input_tag="stream-epochs")

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(input_path)

    def _write_marker(batch_id: int) -> None:
        man_path = os.path.join(idx_dir, SHARD_MANIFEST)
        with open(man_path) as f:
            man = json.load(f)
        man["stream_last_batch"] = int(batch_id)
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, man_path)

    # the bootstrap's build + marker write are two steps; the pending
    # sentinel distinguishes a crashed bootstrap (same batch replays ->
    # just finish the marker) from an ADOPTED pre-existing batch index
    # (first streamed batch must append)
    pending = os.path.join(work_dir, "bootstrap_pending")

    def sink(batch_df, batch_id: int) -> None:
        man_path = os.path.join(idx_dir, SHARD_MANIFEST)
        if not os.path.exists(man_path):
            with open(pending, "w") as f:
                f.write(str(int(batch_id)))
            build_sharded_index(spark, batch_df, idx_dir, num_shards=1,
                                config=cfg)
            _write_marker(batch_id)
            os.remove(pending)
            return
        sidx = ShardedIndex(spark, idx_dir)
        if "stream_last_batch" not in sidx.manifest and \
                os.path.exists(pending):
            # crashed bootstrap: the index was built from THIS batch
            # (build_sharded_index is itself resumable); finish the marker
            build_sharded_index(spark, batch_df, idx_dir, num_shards=1,
                                config=cfg)
            _write_marker(batch_id)
            os.remove(pending)
            return
        if int(batch_id) <= int(sidx.manifest.get("stream_last_batch", -1)):
            return  # retried batch: epoch already committed atomically
        append_docs(spark, sidx, batch_df, config=cfg,
                    extra_manifest={"stream_last_batch": int(batch_id)})

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation",
                      os.path.join(work_dir, "checkpoint")))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return ShardedIndex(spark, idx_dir)
    return writer.start()


# ---------------------------------------------------------------------------
# stream_sessionize — custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

SESSION_GAP_S = 600  # same gap as ops.events batch sessionize

_SESS_OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, "
    "n_events bigint"
)
_SESS_STATE_SCHEMA = (
    "starts array<bigint>, ends array<bigint>, counts array<bigint>"
)


def stream_sessionize(events, gap_s: int = SESSION_GAP_S):
    """Streaming gap-based sessionization: a custom stateful operator via
    applyInPandasWithState.

    Input: a STREAMING DataFrame with (user_id: long, tsec: long). State
    per user = its current disjoint session intervals (starts/ends/counts
    — O(sessions) per user, never the raw events). Each event either opens
    a session, extends one, or BRIDGES two adjacent sessions into one; the
    merge is order-independent (sessions are the connected components of
    events under |ti - tj| <= gap along the sorted axis), so late or
    out-of-order arrivals converge to exactly the batch result —
    ops.events.events_sessionize semantics, verified value-identical by
    the events_sessionize_stream driver entry and pytest.

    Emits the user's full current session list each micro-batch (update
    mode): downstream keeps the latest emission per user. At scale this is
    the standard keyed-state pattern: state lives in the state store
    partitioned by user_id, no shuffle beyond the groupBy.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def upd(key, pdfs, state):
        if state.exists:
            st_starts, st_ends, st_counts = state.get
            starts = list(st_starts)
            ends = list(st_ends)
            counts = list(st_counts)
        else:
            starts, ends, counts = [], [], []
        for pdf in pdfs:
            for t in pdf["tsec"]:
                t = int(t)
                lo, hi, n = t, t, 1
                ks, ke, kc = [], [], []
                for s, e, c in zip(starts, ends, counts):
                    if s - gap_s <= t <= e + gap_s:
                        lo, hi, n = min(lo, s), max(hi, e), n + c
                    else:
                        ks.append(s)
                        ke.append(e)
                        kc.append(c)
                # insert the (possibly merged) session, keeping start order
                i = 0
                while i < len(ks) and ks[i] < lo:
                    i += 1
                ks.insert(i, lo)
                ke.insert(i, hi)
                kc.insert(i, n)
                starts, ends, counts = ks, ke, kc
        state.update((starts, ends, counts))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(starts),
                "session_start": starts,
                "session_end": ends,
                "n_events": counts,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        upd,
        _SESS_OUT_SCHEMA,
        _SESS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap_s: int = SESSION_GAP_S,
):
    """Drive stream_sessionize over the parquet files currently in
    input_dir (trigger availableNow), returning the final sessions as a
    local pandas DataFrame (latest emission per user wins). Re-running
    after more files arrive resumes from the checkpointed state."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("tsec", T.LongType(), True),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    sess = stream_sessionize(stream, gap_s=gap_s)
    emissions: list = []

    def sink(batch_df, batch_id: int) -> None:
        emissions.append((batch_id, batch_df.toPandas()))

    q = (
        sess.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    if not emissions:
        return pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
    latest: dict = {}
    for batch_id, pdf in sorted(emissions, key=lambda x: x[0]):
        for uid, g in pdf.groupby("user_id"):
            latest[uid] = g
    out = pd.concat(latest.values(), ignore_index=True) if latest else (
        emissions[-1][1]
    )
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
