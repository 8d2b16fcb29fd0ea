"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video decoding libraries are not available in this
environment, so the *decode step* is a deterministic parser of a synthetic
header (clearly marked below) — but every piece of Spark plumbing is real
and is what a production pipeline needs at 100 TB:

  - a `media(doc_id, kind, payload: binary)` table derived deterministically
    from `documents` (payload = ascii header + utf-8 body);
  - `media_metadata`: mapInPandas over Arrow batches of binary payloads,
    emitting a typed StructType (kind, width, height, duration_ms, n_bytes,
    checksum) — the exact shape of a decode/feature-extract stage (batch
    boundaries, binary Arrow columns, fixed output schema);
  - `media_frame_sample`: frame-index expansion for video rows (explode of
    a computed per-row sequence = frame sampling) with per-frame checksums.

Both entries are verified value-identical against DuckDB SQL oracles that
recompute the payloads' contents from first principles.

A real decoder drops in by replacing `_parse_payload` (e.g. PIL / ffmpeg on
the payload bytes); the schema, partitioning, and batch shape stay the same.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.ops.common import hash60, sql_hash60

KINDS = ["image", "audio", "video"]
FRAME_STEP_MS = 500  # video sampled at 2 fps
FRAME_EVERY = 4      # keep every 4th frame


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the media table: payload = 'MEDIA|{kind}|w={w}|h={h}|d={d}|'
    header followed by the document text as the opaque body."""
    import os

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    width = F.col("doc_id") * 37 % 2048 + 16
    height = F.col("doc_id") * 53 % 1024 + 16
    dur = F.length("text") * 40
    header = F.format_string(
        "MEDIA|%s|w=%d|h=%d|d=%d|", kind, width, height, dur
    )
    return d.select(
        "doc_id",
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("payload"),
    )


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def _parse_payload(payload: bytes) -> tuple[str, int, int, int, int, int]:
    """DETERMINISTIC DECODE STUB — replace with a real decoder (PIL/ffmpeg)
    in production; parses the synthetic header and checksums the body."""
    parts = payload.split(b"|", 5)
    kind = parts[1].decode()
    width = int(parts[2][2:])
    height = int(parts[3][2:])
    dur = int(parts[4][2:])
    body = parts[5]
    checksum = int(hashlib.md5(body).hexdigest()[:15], 16)
    return kind, width, height, dur, len(payload), checksum


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                kind, w, h, d, nb, ck = _parse_payload(bytes(payload))
                rows.append((int(doc_id), kind, w, h, d, nb, ck))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
                )

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


MEDIA_META_SQL = f"""
WITH m AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
         (doc_id * 37 % 2048 + 16)::BIGINT AS width,
         (doc_id * 53 % 1024 + 16)::BIGINT AS height,
         (length(text) * 40)::BIGINT AS duration_ms,
         text
  FROM documents
)
SELECT doc_id, kind, width, height, duration_ms,
       (length('MEDIA|' || kind || '|w=' || width || '|h=' || height
               || '|d=' || duration_ms || '|')
        + octet_length(encode(text)))::BIGINT AS n_bytes,
       {sql_hash60('text')} AS checksum
FROM m
ORDER BY doc_id
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: frames every FRAME_STEP_MS, keep every
    FRAME_EVERY-th; per-frame checksum = H(body_checksum ':' frame_idx)."""
    meta = media_metadata(spark, sf_dir)
    vids = meta.where(F.col("kind") == "video")
    frames = vids.select(
        "doc_id",
        "checksum",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("duration_ms") - 1) / FRAME_STEP_MS).cast("long"),
            )
        ).alias("frame_idx"),
    ).where(F.col("frame_idx") % FRAME_EVERY == 0)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        hash60(
            F.concat(
                F.col("checksum").cast("string"),
                F.lit(":"),
                F.col("frame_idx").cast("string"),
            )
        ).alias("frame_hash"),
    )


MEDIA_FRAMES_SQL = f"""
WITH m AS (
  SELECT doc_id, (length(text) * 40)::BIGINT AS duration_ms,
         {sql_hash60('text')} AS checksum
  FROM documents
  WHERE doc_id % 3 = 2
),
series AS (
  SELECT unnest(generate_series(
    0, (SELECT coalesce(max((duration_ms - 1) // {FRAME_STEP_MS}), 0) FROM m)))
    AS frame_idx
),
frames AS (
  SELECT m.doc_id, s.frame_idx, m.checksum
  FROM m, series s
  WHERE s.frame_idx <= (m.duration_ms - 1) // {FRAME_STEP_MS}
    AND s.frame_idx % {FRAME_EVERY} = 0
)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       {sql_hash60("checksum || ':' || frame_idx")} AS frame_hash
FROM frames
ORDER BY doc_id, frame_idx
"""


SPARK_QUERIES = {
    "media_metadata": media_metadata,
    "media_frame_sample": media_frame_sample,
}

ORACLE_SQLS = {
    "media_metadata": MEDIA_META_SQL,
    "media_frame_sample": MEDIA_FRAMES_SQL,
}
