"""Deduplication operators for training-data pipelines.

  dedup_exact            exact duplicate grouping by 60-bit text fingerprint
  dedup_ngram_jaccard    3-gram-shingle Jaccard >= 0.5 pair detection
  dedup_cluster          connected components of the near-dup pair graph
                         (min-label propagation) + canonical-doc selection
  dedup_minhash_lsh      MinHash (16 perms) + LSH banding (4 bands x 4 rows)
                         candidate pairs with exact-Jaccard verification
  dedup_simhash          60-bit SimHash, Hamming <= 3 pairs via 6x10-bit
                         word pigeonhole blocking on all C(6,3)=20 3-word
                         subsets (a subset match is a *complete* candidate
                         generator for Hamming <= 3)
  dedup_embedding        embedding-cosine near-dup pairs (integer-quantized
                         dot products -> exact cross-engine arithmetic)

Scale design: every operator is blocking-based — the only joins are on
shingle / band-signature / simhash-word / LSH-bucket keys, never an O(n^2)
cross join (dedup_embedding uses bucketed candidate pairs at scale; the
all-pairs form here is the sf<=0.1 oracle-checkable configuration).
All are verified value-identical against DuckDB SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dint_spark.ops.common import (
    MINHASH_BANDS,
    MINHASH_P,
    MINHASH_PARAMS,
    MINHASH_ROWS,
    hash60,
    q6,
    sql_hash60,
    sql_q6,
    tokens_col,
)

JACCARD_THRESHOLD = 0.5
# Hot-shingle document-frequency cap for the exact-Jaccard self-join: a
# shingle occurring in n docs contributes ~n^2/2 candidate rows, and web
# boilerplate guarantees such shingles at crawl scale (round-2 VERDICT).
# Shingles with df > cap are dropped from the shingle sets BEFORE the join
# (and from the size denominators — Jaccard is computed over the capped
# shingle space, identically in the DuckDB oracle), bounding every
# shingle's candidate contribution by cap^2/2. Recall contract: only pairs
# whose EVERY common shingle is boilerplate-hot are missed — the standard
# dedup-pipeline tradeoff, and the MinHash path (dedup_minhash_lsh, the
# recommended dedup_cluster feeder at scale) bounds the same risk by
# banding instead of dropping.
NGRAM_MAX_SHINGLE_DF = 128
SIMHASH_HAMMING_MAX = 3
SIMHASH_BITS = 60
# Blocking: 6 words of 10 bits, candidate keys = the C(6,3)=20 3-word
# subsets (30-bit keys). Hamming <= 3 dirties at most 3 words, leaving >= 3
# clean words, so at least one 3-subset matches exactly -> COMPLETE for
# Hamming <= 3. Candidate volume ~= 20 * n^2/2^30 vs the round-1 4-word
# scheme's 4 * n^2/2^15 — a ~2^15/5 ≈ 6500x tighter bound on random codes.
SIMHASH_WORDS = 6
SIMHASH_WORD_BITS = 10
SIMHASH_SUBSET_SIZE = 3
EMB_COS_THRESHOLD = 0.35
EMB_SCALE = 1 << 20


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


_NORM_SQL = """
norm AS (
  SELECT doc_id,
         array_to_string(
           list_filter(string_split_regex(lower(text), '[^0-9a-z]+'),
                       x -> x <> ''), ' ') AS nt
  FROM documents
)
"""

# shingles: distinct 3-gram word shingles per doc (docs with < 3 tokens have
# an empty shingle set and appear in no pair)
_SHINGLES_SQL = """
tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^0-9a-z]+'),
                     x -> x <> '') AS ts
  FROM documents
),
tser AS (
  SELECT unnest(generate_series(
    1, (SELECT coalesce(max(len(ts)), 0) FROM tl))) AS i
),
sh AS (
  SELECT DISTINCT doc_id,
         ts[s.i] || ' ' || ts[s.i + 1] || ' ' || ts[s.i + 2] AS shingle
  FROM tl, tser s
  WHERE s.i <= len(ts) - 2
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1)
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-gram word shingles per doc (Spark side of _SHINGLES_SQL)."""
    d = _documents(spark, sf_dir)
    toks = d.select("doc_id", tokens_col().alias("ts"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("ts", i + 1),
                        F.element_at("ts", i + 2),
                        F.element_at("ts", i + 3),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    return sh.distinct()


# ---------------------------------------------------------------------------
# dedup_exact
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    fp = d.select("doc_id", hash60(F.array_join(tokens_col(), " ")).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").cast("long").alias("group_size"),
    )
    return fp.join(groups, "fp").select(
        "doc_id", "canonical_id", "group_size", "fp"
    )


DEDUP_EXACT_SQL = f"""
WITH {_NORM_SQL.strip()},
fp AS (SELECT doc_id, {sql_hash60('nt')} AS fp FROM norm),
groups AS (
  SELECT fp, min(doc_id) AS canonical_id, count(*)::BIGINT AS group_size
  FROM fp GROUP BY 1
)
SELECT f.doc_id, g.canonical_id, g.group_size, f.fp
FROM fp f JOIN groups g ON f.fp = g.fp
ORDER BY f.doc_id
"""


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str,
    max_shingle_df: int = NGRAM_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard >= 0.5 pairs over df-capped 3-gram shingle sets.

    The self-join below is the n^2-per-hot-shingle hazard; the df cap
    (see NGRAM_MAX_SHINGLE_DF) bounds it. The cap is part of the
    operator's definition — the DuckDB oracle applies it identically."""
    sh_all = _shingles(spark, sf_dir)
    # df-cap BEFORE the self-join: one map-side-combined agg over the
    # shingle rows + a hash semi-join (both shuffle |shingle rows| once);
    # the join key stays `shingle`, so no candidate blowup survives.
    ok = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("sdf"))
        .where(F.col("sdf") <= max_shingle_df)
        .select("shingle")
    )
    sh = sh_all.join(ok, "shingle", "left_semi").cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jacc_q",
            q6(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))),
        )
    )
    return jac.where(
        F.col("jacc_q") >= int(JACCARD_THRESHOLD * 1e6)
    ).select("doc_a", "doc_b", "inter", "jacc_q")


# capped shingle set + its sizes (the df cap of dedup_ngram_jaccard),
# shared by the jaccard and cluster oracles
_CAPPED_SHINGLES_SQL = f"""
shc AS (
  SELECT s.doc_id, s.shingle FROM sh s
  JOIN (SELECT shingle FROM sh GROUP BY 1
        HAVING count(*) <= {NGRAM_MAX_SHINGLE_DF}) k USING (shingle)
),
capsz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM shc GROUP BY 1)
"""

DEDUP_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL.strip()},
{_CAPPED_SHINGLES_SQL.strip()},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b, i.inter,
         {sql_q6('i.inter / (sa.sz + sb.sz - i.inter)')} AS jacc_q
  FROM inter i
  JOIN capsz sa ON sa.doc_id = i.doc_a
  JOIN capsz sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, inter, jacc_q FROM jac
WHERE jacc_q >= {int(JACCARD_THRESHOLD * 1e6)}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# dedup_minhash_lsh
# ---------------------------------------------------------------------------

def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir).cache()
    # All 16 permutation minima are parallel aggregates of ONE
    # map-side-combined hash agg over the distinct shingle rows (plus the
    # distinct-shingle count reused for exact Jaccard below) — no 16x
    # param crossJoin row blowup, no second pivot aggregation. At 100 TB
    # this is one shuffle of |distinct shingles| rows carrying 17 longs,
    # with partial min/count combining on the map side.
    shh = sh.withColumn("h", hash60(F.col("shingle")) % F.lit(MINHASH_P))
    mins = [
        F.min(
            (F.lit(a).cast("long") * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    per_doc = shh.groupBy("doc_id").agg(
        *mins, F.count("*").cast("long").alias("sz")).cache()
    band_structs = F.array(*[
        F.struct(
            F.lit(bnd).cast("int").alias("band"),
            F.concat_ws(",", *[
                F.col(f"mh{bnd * MINHASH_ROWS + j}").cast("string")
                for j in range(MINHASH_ROWS)
            ]).alias("sig"),
        )
        for bnd in range(MINHASH_BANDS)
    ])
    sig = per_doc.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_bands"))
    )
    sizes = per_doc.select("doc_id", "sz")
    ia = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    ib = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ia, "doc_a")
        .join(ib, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            q6(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("jacc_q"),
        )
    )


_PARAMS_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS)
)

DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_SQL.strip()},
shh AS (SELECT doc_id, shingle, {sql_hash60('shingle')} % {MINHASH_P} AS h FROM sh),
params(i, a, b) AS (VALUES {_PARAMS_VALUES}),
mh AS (
  SELECT doc_id, p.i, min((p.a * h + p.b) % {MINHASH_P}) AS mh
  FROM shh, params p GROUP BY 1, 2
),
sig AS (
  SELECT doc_id, (i // {MINHASH_ROWS})::INT AS band,
         string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
  FROM mh GROUP BY 1, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_bands
  FROM sig a
  JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS inter
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND x.shingle = y.shingle
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.n_bands,
       {sql_q6('coalesce(i.inter, 0) / (sa.sz + sb.sz - coalesce(i.inter, 0))')}
         AS jacc_q
FROM cand c
LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
ORDER BY c.doc_a, c.doc_b
"""


# ---------------------------------------------------------------------------
# dedup_simhash
# ---------------------------------------------------------------------------

def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 60-bit SimHash split into 6x10-bit words (w0..w5, full)."""
    d = _documents(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("h", hash60(F.col("term")))
    )
    bits = spark.createDataFrame(
        [(b,) for b in range(SIMHASH_BITS)], ["b"]
    )
    contrib = tf.crossJoin(F.broadcast(bits)).select(
        "doc_id",
        "b",
        (
            F.col("tf")
            * (F.expr("(shiftright(h, CAST(b AS INT)) & 1) * 2 - 1"))
        ).alias("c"),
    )
    bitvals = (
        contrib.groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
        .select(
            "doc_id",
            "b",
            F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)).alias("bit"),
        )
    )
    words = (
        bitvals.withColumn("w", (F.col("b") / SIMHASH_WORD_BITS).cast("int"))
        .withColumn(
            "wv",
            F.col("bit")
            * F.expr(
                f"CAST(shiftleft(1L, CAST(b % {SIMHASH_WORD_BITS} AS INT)) AS BIGINT)"
            ),
        )
        .groupBy("doc_id", "w")
        .agg(F.sum("wv").cast("long").alias("word"))
    )
    sig = words.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("w") == j, F.col("word"))).alias(f"w{j}")
            for j in range(SIMHASH_WORDS)
        ]
    )
    full = sum(
        (F.coalesce(F.col(f"w{j}"), F.lit(0)) * (1 << (SIMHASH_WORD_BITS * j))
         for j in range(1, SIMHASH_WORDS)),
        F.coalesce(F.col("w0"), F.lit(0)),
    )
    return sig.select(
        "doc_id",
        *[F.coalesce(F.col(f"w{j}"), F.lit(0)).alias(f"w{j}") for j in range(SIMHASH_WORDS)],
        full.cast("long").alias("simhash"),
    )


def _simhash_block_keys(sig: DataFrame) -> DataFrame:
    """Long-format blocking keys: 20 rows per doc, one per 3-word subset,
    key = (subset_id, w_i, w_j, w_k) — a 30-bit composite equi-join key."""
    from itertools import combinations

    subsets = list(combinations(range(SIMHASH_WORDS), SIMHASH_SUBSET_SIZE))
    key_structs = F.array(*[
        F.struct(
            F.lit(si).alias("s"),
            F.col(f"w{i}").alias("k0"),
            F.col(f"w{j}").alias("k1"),
            F.col(f"w{k}").alias("k2"),
        )
        for si, (i, j, k) in enumerate(subsets)
    ])
    return sig.select(
        "doc_id", "simhash", F.explode(key_structs).alias("key")
    ).select("doc_id", "simhash", "key.s", "key.k0", "key.k1", "key.k2")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with SimHash Hamming distance <= 3, via complete 3-subset
    blocking (see SIMHASH_WORDS comment): shuffle equi-joins on 30-bit keys
    only — the result is identical to an all-pairs Hamming scan, which is
    what the oracle computes."""
    sig = _simhash_sigs(spark, sf_dir).cache()
    keys = _simhash_block_keys(sig)
    a = keys.alias("a")
    b = keys.alias("b")
    pairs = (
        a.join(b, ["s", "k0", "k1", "k2"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"),
        )
    )
    return pairs.where(F.col("hamming") <= SIMHASH_HAMMING_MAX).select(
        "doc_a", "doc_b", "hamming"
    )


_SIMHASH_CORE_SQL = f"""
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2
),
th AS (SELECT doc_id, term, tf, {sql_hash60('term')} AS h FROM tf),
bits AS (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b),
bitvals AS (
  SELECT doc_id, b,
         CASE WHEN sum(tf * (((h >> b) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END
           AS bit
  FROM th, bits GROUP BY 1, 2
),
sigf AS (
  SELECT doc_id, sum(bit * (1::BIGINT << b))::BIGINT AS simhash
  FROM bitvals GROUP BY 1
)
"""

_TOKS_SQL = """
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^0-9a-z]+')) AS term
  FROM documents
),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')
"""

# the 3-subset blocking is COMPLETE for Hamming <= 3, so the oracle is the
# straightforward all-pairs Hamming scan (exact spec, fine at oracle scale)
DEDUP_SIMHASH_SQL = f"""
WITH {_TOKS_SQL.strip()},
{_SIMHASH_CORE_SQL.strip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sigf a, sigf b
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# dedup_embedding (cosine near-dup, integer-quantized)
# ---------------------------------------------------------------------------

def _emb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with integer-quantized components + exact int norms."""
    e = _embeddings(spark, sf_dir)
    eq = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * EMB_SCALE).cast("long")
    )
    return e.select(
        "vec_id",
        eq.alias("eq"),
        F.aggregate(
            eq, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("n2"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


EMB_PROBE_HAMMING = 2  # bucket-Hamming radius for candidate generation


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs = bucket-Hamming <= 2 (16-bit hyperplane LSH) AND
    exact quantized cosine >= threshold.

    Scale path (round-2 fix): candidates come from an LSH-bucket EQUI-join —
    side a explodes into its C(16,<=2)=137 probe buckets (exactly the
    Hamming-<=2 ball), joined on `bucket` against the bucketed corpus with
    vec_a < vec_b; each qualifying pair is produced exactly once (the mask
    is the XOR of the two codes). Exact integer dot products are computed
    only on candidates. No cross join anywhere; candidate volume is
    sum over buckets of |bucket|^2 x 137/2^16 instead of n^2/2. The oracle
    applies the same bucket-Hamming pre-filter, so results are identical by
    construction. The exhaustive-exact form survives as
    dedup_embedding_allpairs (the <=sf0.1 oracle configuration)."""
    from dint_spark.ops.similarity import (
        NUM_PLANES, _lsh_buckets, probe_masks)

    eqs = _emb_q(spark, sf_dir).cache()
    ev = eqs.join(_lsh_buckets(spark, eqs), "vec_id")
    mask_lits = F.array(*[F.lit(m) for m, _ in probe_masks(NUM_PLANES,
                                                           EMB_PROBE_HAMMING)])
    probes = (
        ev.select(F.col("vec_id").alias("vec_a"),
                  F.col("bucket").alias("bucket_a"))
        .withColumn("mask", F.explode(mask_lits))
        .select("vec_a",
                F.col("bucket_a").bitwiseXOR(F.col("mask")).alias("bucket"))
    )
    cand = (
        probes.join(ev.select(F.col("vec_id").alias("vec_b"), "bucket"),
                    "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    ea = eqs.select(F.col("vec_id").alias("vec_a"), F.col("eq").alias("eq_a"),
                    F.col("n2").alias("n2_a"))
    eb = eqs.select(F.col("vec_id").alias("vec_b"), F.col("eq").alias("eq_b"),
                    F.col("n2").alias("n2_b"))
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b").select(
        "vec_a", "vec_b",
        _dot(F.col("eq_a"), F.col("eq_b")).alias("dot"),
        "n2_a", "n2_b",
    )
    cos = F.col("dot") / F.sqrt(
        F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
    )
    return (
        pairs.withColumn("cos_q", q6(cos))
        .where(F.col("cos_q") >= int(EMB_COS_THRESHOLD * 1e6))
        .select("vec_a", "vec_b", "cos_q")
    )


def dedup_embedding_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive exact cosine pairs — the <=sf0.1 oracle-checkable
    configuration ONLY (O(n^2) by definition; the production path is
    dedup_embedding's LSH-bucketed candidate generation)."""
    eqs = _emb_q(spark, sf_dir)
    a = eqs.alias("a")
    b = eqs.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _dot(F.col("a.eq"), F.col("b.eq")).alias("dot"),
        F.col("a.n2").alias("n2_a"),
        F.col("b.n2").alias("n2_b"),
    )
    cos = F.col("dot") / F.sqrt(
        F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
    )
    return (
        pairs.withColumn("cos_q", q6(cos))
        .where(F.col("cos_q") >= int(EMB_COS_THRESHOLD * 1e6))
        .select("vec_a", "vec_b", "cos_q")
    )


_EMBQ_SQL = f"""
dims AS (SELECT unnest(generate_series(1, 64)) AS d),
eq AS (
  SELECT vec_id, d.d,
         floor(embedding[d.d]::DOUBLE * {EMB_SCALE})::BIGINT AS c
  FROM embeddings, dims d
),
n2 AS (SELECT vec_id, sum(c * c)::BIGINT AS n2 FROM eq GROUP BY 1)
"""

DEDUP_EMBEDDING_ALLPAIRS_SQL = f"""
WITH {_EMBQ_SQL.strip()},
dots AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, sum(x.c * y.c)::BIGINT AS dot
  FROM eq x JOIN eq y ON x.d = y.d AND x.vec_id < y.vec_id
  GROUP BY 1, 2
)
SELECT d.vec_a, d.vec_b,
       {sql_q6('d.dot / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE)')} AS cos_q
FROM dots d
JOIN n2 na ON na.vec_id = d.vec_a
JOIN n2 nb ON nb.vec_id = d.vec_b
WHERE {sql_q6('d.dot / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE)')}
      >= {int(EMB_COS_THRESHOLD * 1e6)}
ORDER BY d.vec_a, d.vec_b
"""


def _dedup_embedding_sql() -> str:
    from dint_spark.ops.similarity import LSH_BUCKETS_SQL

    return f"""
WITH {_EMBQ_SQL.strip()},
{LSH_BUCKETS_SQL.strip()},
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a, buckets b
  WHERE a.vec_id < b.vec_id
    AND bit_count(xor(a.bucket, b.bucket)) <= {EMB_PROBE_HAMMING}
),
dots AS (
  SELECT c.vec_a, c.vec_b, sum(x.c * y.c)::BIGINT AS dot
  FROM cand c
  JOIN eq x ON x.vec_id = c.vec_a
  JOIN eq y ON y.vec_id = c.vec_b AND y.d = x.d
  GROUP BY 1, 2
)
SELECT d.vec_a, d.vec_b,
       {sql_q6('d.dot / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE)')} AS cos_q
FROM dots d
JOIN n2 na ON na.vec_id = d.vec_a
JOIN n2 nb ON nb.vec_id = d.vec_b
WHERE {sql_q6('d.dot / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE)')}
      >= {int(EMB_COS_THRESHOLD * 1e6)}
ORDER BY d.vec_a, d.vec_b
"""


DEDUP_EMBEDDING_SQL = _dedup_embedding_sql()


# ---------------------------------------------------------------------------
# dedup_cluster — connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

DEDUP_CLUSTER_MAX_ITERS = 25


def dedup_cluster(spark: SparkSession, sf_dir: str,
                  pair_source: str = "jaccard") -> DataFrame:
    """Near-duplicate CLUSTERS: connected components of the Jaccard >= 0.5
    pair graph, plus canonical-document selection.

    ``pair_source`` selects the edge generator (round-2 VERDICT item 1 —
    the clustering op a pipeline actually runs must not sit on an uncapped
    shingle join):
      "jaccard"  dedup_ngram_jaccard's exact shingle-blocked pairs, hot
                 shingles df-capped (NGRAM_MAX_SHINGLE_DF) — the
                 oracle-checked default.
      "minhash"  dedup_minhash_lsh candidates exact-verified at the same
                 threshold — the recommended feeder at crawl scale:
                 banding bounds candidate volume per doc instead of per
                 shingle, so no boilerplate key can square. Cluster
                 equality between the two sources on the fixture corpus is
                 pinned by tests/test_dedup_cluster.py.

    The pipeline step after pair detection: a dedup job must keep ONE doc
    per duplicate cluster, and pairs alone under-delete chains
    (A~B, B~C but not A~C). Components are computed by min-label
    propagation — label(d) starts at doc_id, each round takes the min over
    neighbors, fixpoint in O(graph diameter) rounds (near-dup clusters are
    shallow: diameter rarely exceeds a handful even at crawl scale). Each
    round is one shuffle join + partial-agg min; the driver sees only the
    scalar converged? count per round (Pregel-style coordination, no data
    on the driver). Lineage is truncated every round via localCheckpoint
    (use reliable checkpointing on a real cluster).

    Output: one row per doc participating in >= 1 near-dup pair:
    (doc_id, cluster_id = min doc_id of its component, csize, keep =
    1 iff doc_id == cluster_id — the deterministic canonical survivor).
    """
    if pair_source == "jaccard":
        pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    elif pair_source == "minhash":
        pairs = (
            dedup_minhash_lsh(spark, sf_dir)
            .where(F.col("jacc_q") >= int(JACCARD_THRESHOLD * 1e6))
            .select("doc_a", "doc_b")
        )
    else:
        raise ValueError(f"unknown pair_source {pair_source!r}")
    edges = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(DEDUP_CLUSTER_MAX_ITERS):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"), F.col("lbl").alias("nbr_lbl")
                ),
                "doc_b",
            )
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("nbr_lbl").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_cluster did not converge in {DEDUP_CLUSTER_MAX_ITERS} "
            "rounds — component diameter exceeds the bound"
        )
    edges.unpersist()
    sizes = labels.groupBy("lbl").agg(F.count("*").cast("long").alias("csize"))
    return labels.join(sizes, "lbl").select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        "csize",
        (F.col("doc_id") == F.col("lbl")).cast("int").alias("keep"),
    )


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip()},
{_CAPPED_SHINGLES_SQL.strip()},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN capsz sa ON sa.doc_id = i.doc_a
  JOIN capsz sb ON sb.doc_id = i.doc_b
  WHERE {sql_q6('i.inter / (sa.sz + sb.sz - i.inter)')}
        >= {int(JACCARD_THRESHOLD * 1e6)}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
lbl AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
),
csizes AS (
  SELECT cluster_id, count(*)::BIGINT AS csize FROM lbl GROUP BY 1
)
SELECT l.doc_id, l.cluster_id, s.csize,
       CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS keep
FROM lbl l JOIN csizes s USING (cluster_id)
ORDER BY l.doc_id
"""


SPARK_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_cluster": dedup_cluster,
    # the crawl-scale feeder as its own gate entry: banding bounds
    # candidate volume per doc, and the clusters must equal the exact
    # shingle-blocked source (same oracle)
    "dedup_cluster_minhash": (
        lambda spark, sf_dir: dedup_cluster(spark, sf_dir,
                                            pair_source="minhash")),
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_allpairs": dedup_embedding_allpairs,
}

ORACLE_SQLS = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "dedup_cluster": DEDUP_CLUSTER_SQL,
    "dedup_cluster_minhash": DEDUP_CLUSTER_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "dedup_embedding_allpairs": DEDUP_EMBEDDING_ALLPAIRS_SQL,
}
