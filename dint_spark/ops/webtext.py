"""Web-crawl curation operators for training-data pipelines over `documents`.

These are the pipeline stages a crawl-scale corpus goes through between the
raw fetch and the tokenizer, beyond the near-dup family in dedup.py
(reference scope: the reference engine indexes an already-curated corpus —
these ops have no counterpart there; they are builder-brief additions):

  text_repetition       Gopher-style intra-document repetition metrics
                        (top 2-gram share, duplicate 3-gram fraction)
  quality_filter        composed boolean quality gate (Gopher-rule shape):
                        integer-exact flags over one map-side pass
  decontaminate         benchmark n-gram overlap flagging (test-set
                        contamination removal before training)
  sample_stratified     deterministic hash-threshold corpus sampling
                        (reproducible train/eval splits, no RNG state)
  vocab_stats           corpus-level term/document frequency table (top-K)
  span_dedup            C4-style cross-document duplicate-span metrics
                        (fraction of a doc's 5-token spans seen elsewhere)
  domain_stats          per-source corpus accounting (docs, tokens, langs,
                        exact-dup docs) for domain-level filtering
  unigram_logprob       corpus-unigram-LM average token log-probability
                        (the relational core of a perplexity filter)
  pii_scrub             regex PII detection + redaction fingerprint
                        (emails / IPv4 / long digit runs)

Scale notes (the 100-TB contract, per op):

  text_repetition  n-gram rows shuffle keyed by (doc_id, gram) — high
                   cardinality, no skew (a gram repeated within one doc is
                   still one group); both aggs partial-combine map-side.
  quality_filter   single narrow projection, zero shuffles; all flag
                   arithmetic is integer-exact so the oracle compare is
                   bitwise, not epsilon.
  decontaminate    the benchmark shingle set is bounded (a benchmark suite
                   is ~10^6-10^8 shingles, independent of corpus size), so
                   the probe join is a broadcast semi-join: corpus-side
                   rows never shuffle. Shingles travel as 60-bit hashes,
                   not strings.
  sample_stratified  map-side hash threshold — no shuffle, no RNG state,
                   same sample on any cluster size / partitioning.
  vocab_stats      two map-side-combinable aggs ((term,doc) then term);
                   the final top-K is a TakeOrdered, not a full sort.
  span_dedup       distinct (doc, span-hash) rows shuffle once by hash for
                   the doc-count agg, once by doc for the per-doc metrics;
                   a boilerplate span in n docs is n rows + one count row,
                   never an n^2 pair set (contrast dedup_ngram_jaccard,
                   which must emit pairs).
  domain_stats     stacked (source, fingerprint) -> source aggs; exact
                   distinct counts without count(DISTINCT) holding sets.
  unigram_logprob  the unigram table is ~vocab-sized (10^7-10^8 rows at
                   crawl scale) — broadcast when small, hash-join on term
                   otherwise; per-term log-prob is quantized to int64
                   BEFORE the per-doc sum, so the doc score is an exact
                   integer sum (no float summation order dependence).
  pii_scrub        map-only regex counts + redaction fingerprint; the
                   redacted text itself never shuffles (only its 60-bit
                   hash), so the op adds no wide rows at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dint_spark.ops.common import (
    SQL_TOKS,
    hash60,
    q6,
    sql_hash60,
    sql_q6,
    tokens_col,
)


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _grams(ts: Column, k: int) -> Column:
    """Contiguous k-gram strings (' '-joined) from a token array; [] when
    fewer than k tokens. slice() is 1-indexed; sequence() would count
    backwards when size < k, hence the guard."""
    n = F.size(ts)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(ts, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sql_grams(k: int) -> str:
    """DuckDB mirror of _grams over a 1-indexed list column ``ts``
    (range(1, n+1-k) is empty when n < k, matching the Spark guard)."""
    return (
        f"list_transform(range(1, len(ts) + 1 - {k - 1}), "
        f"i -> array_to_string(list_slice(ts, i, i + {k - 1}), ' '))"
    )


SQL_TOKARR = """
tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^0-9a-z]+'),
                     x -> x <> '') AS ts
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# text_repetition — Gopher-style intra-document repetition metrics
# ---------------------------------------------------------------------------

def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: total 2-grams, the most-frequent-2-gram share, and the
    fraction of 3-gram occurrences whose 3-gram occurs more than once
    (both q6 fixed-point). The Gopher rules (Rae et al., 2021, §A1.1)
    threshold exactly these to drop boilerplate/spammy pages."""
    d = _documents(spark, sf_dir)
    ts = tokens_col()

    def rep(k: int, top_name: str, dup_name: str) -> DataFrame:
        g = d.select("doc_id", F.explode(_grams(ts, k)).alias("gram"))
        per_gram = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        return per_gram.groupBy("doc_id").agg(
            F.max("c").alias(top_name),
            F.sum("c").alias(f"n{k}"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                dup_name
            ),
        )

    r2 = rep(2, "top2", "dup2")
    r3 = rep(3, "top3", "dup3")
    out = (
        d.select("doc_id")
        .join(r2.select("doc_id", "top2", "n2"), "doc_id", "left")
        .join(r3.select("doc_id", "n3", "dup3"), "doc_id", "left")
    )
    n2 = F.coalesce("n2", F.lit(0)).cast("long")
    n3 = F.coalesce("n3", F.lit(0)).cast("long")
    return out.select(
        "doc_id",
        n2.alias("n_2grams"),
        F.when(n2 > 0, q6(F.col("top2") / n2)).otherwise(F.lit(0))
        .alias("top2_share_q"),
        F.when(n3 > 0, q6(F.col("dup3") / n3)).otherwise(F.lit(0))
        .alias("dup3_frac_q"),
    )


TEXT_REPETITION_SQL = f"""
WITH {SQL_TOKARR.strip()},
g2 AS (
  SELECT doc_id, unnest({_sql_grams(2)}) AS gram FROM tokarr
),
g3 AS (
  SELECT doc_id, unnest({_sql_grams(3)}) AS gram FROM tokarr
),
pg2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
pg3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
r2 AS (
  SELECT doc_id, max(c) AS top2, sum(c)::BIGINT AS n2 FROM pg2 GROUP BY 1
),
r3 AS (
  SELECT doc_id, sum(c)::BIGINT AS n3,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3
  FROM pg3 GROUP BY 1
)
SELECT d.doc_id,
       coalesce(r2.n2, 0)::BIGINT AS n_2grams,
       CASE WHEN coalesce(r2.n2, 0) > 0
            THEN {sql_q6('r2.top2 / r2.n2')} ELSE 0 END AS top2_share_q,
       CASE WHEN coalesce(r3.n3, 0) > 0
            THEN {sql_q6('r3.dup3 / r3.n3')} ELSE 0 END AS dup3_frac_q
FROM documents d
LEFT JOIN r2 ON d.doc_id = r2.doc_id
LEFT JOIN r3 ON d.doc_id = r3.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# quality_filter — composed boolean gate, integer-exact
# ---------------------------------------------------------------------------

# All thresholds are expressed as integer cross-multiplications so the
# Spark/DuckDB compare is exact (no float thresholds):
#   f_len:   10 <= n_tokens <= 5000
#   f_avg:   3 <= avg token length <= 10      (3*nt <= sum_len <= 10*nt)
#   f_stop:  at least 2 stopword hits
#   f_uniq:  distinct-token ratio >= 0.2      (5*n_uniq >= n_tokens)
#   f_alnum: alnum-char ratio >= 0.75         (4*n_alnum >= 3*n_chars)
QF_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it"]


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in QF_STOPWORDS])
    m = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^0-9a-z]", ""))
        .cast("long").alias("n_alnum"),
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("long").alias("n_stop"),
    )
    nt = F.col("nt")
    flags = {
        "f_len": (nt >= 10) & (nt <= 5000),
        "f_avg": (3 * nt <= F.col("sum_len"))
        & (F.col("sum_len") <= 10 * nt),
        "f_stop": F.col("n_stop") >= 2,
        "f_uniq": 5 * F.col("n_uniq") >= nt,
        "f_alnum": 4 * F.col("n_alnum") >= 3 * F.col("n_chars"),
    }
    cols = [c.cast("long").alias(n) for n, c in flags.items()]
    passed = None
    for c in flags.values():
        passed = c if passed is None else (passed & c)
    return m.select("doc_id", *cols, passed.cast("long").alias("pass"))


_QF_STOP_IN = ", ".join(f"'{s}'" for s in QF_STOPWORDS)

QUALITY_FILTER_SQL = f"""
WITH {SQL_TOKS.strip()},
base AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars,
         length(regexp_replace(lower(text), '[^0-9a-z]', '', 'g'))::BIGINT
           AS n_alnum
  FROM documents
),
agg AS (
  SELECT d.doc_id,
         count(t.term)::BIGINT AS nt,
         count(DISTINCT t.term)::BIGINT AS n_uniq,
         coalesce(sum(length(t.term)), 0)::BIGINT AS sum_len,
         coalesce(sum(CASE WHEN t.term IN ({_QF_STOP_IN})
                           THEN 1 ELSE 0 END), 0)::BIGINT AS n_stop
  FROM documents d LEFT JOIN toks2 t ON d.doc_id = t.doc_id
  GROUP BY 1
),
f AS (
  SELECT b.doc_id,
         (a.nt >= 10 AND a.nt <= 5000)::BIGINT AS f_len,
         (3 * a.nt <= a.sum_len AND a.sum_len <= 10 * a.nt)::BIGINT AS f_avg,
         (a.n_stop >= 2)::BIGINT AS f_stop,
         (5 * a.n_uniq >= a.nt)::BIGINT AS f_uniq,
         (4 * b.n_alnum >= 3 * b.n_chars)::BIGINT AS f_alnum
  FROM base b JOIN agg a ON b.doc_id = a.doc_id
)
SELECT doc_id, f_len, f_avg, f_stop, f_uniq, f_alnum,
       (f_len * f_avg * f_stop * f_uniq * f_alnum)::BIGINT AS pass
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# decontaminate — benchmark n-gram overlap flagging
# ---------------------------------------------------------------------------

CONTAM_K = 8          # token shingle length probed against the benchmark
CONTAM_BENCH_MOD = 97  # doc_id % MOD == RES defines the benchmark split
CONTAM_BENCH_RES = 3


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag documents sharing any CONTAM_K-token shingle with the benchmark
    split (docs with doc_id % 97 == 3 stand in for a held-out eval suite).
    Real pipelines run exactly this shape before training (e.g. GPT-3
    app. C / PaLM app. F 13-gram decontamination): benchmark shingles are
    corpus-size-independent, so they broadcast; the corpus side stays
    map-side except the per-doc hit count agg (keyed by doc_id, no skew)."""
    d = _documents(spark, sf_dir)
    sh = d.select(
        "doc_id",
        F.explode(_grams(tokens_col(), CONTAM_K)).alias("g"),
    ).select("doc_id", hash60(F.col("g")).alias("sh")).distinct()
    is_bench = (F.col("doc_id") % CONTAM_BENCH_MOD) == CONTAM_BENCH_RES
    bench = sh.where(is_bench).select("sh").distinct()
    hits = (
        sh.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        d.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            is_bench.cast("long").alias("is_benchmark"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("long")
            .alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH {SQL_TOKARR.strip()},
sh AS (
  SELECT DISTINCT doc_id, {sql_hash60('g.gram')} AS sh
  FROM (
    SELECT doc_id, unnest({_sql_grams(CONTAM_K)}) AS gram FROM tokarr
  ) g
),
bench AS (
  SELECT DISTINCT sh FROM sh
  WHERE doc_id % {CONTAM_BENCH_MOD} = {CONTAM_BENCH_RES}
),
hits AS (
  SELECT s.doc_id, count(*)::BIGINT AS n_hits
  FROM sh s JOIN bench b ON s.sh = b.sh
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (d.doc_id % {CONTAM_BENCH_MOD} = {CONTAM_BENCH_RES})::BIGINT
         AS is_benchmark,
       (coalesce(h.n_hits, 0) > 0)::BIGINT AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# sample_stratified — deterministic hash-threshold sampling
# ---------------------------------------------------------------------------

SAMPLE_SALT = "smp:"
SAMPLE_NUM = 1          # keep docs with H(salt || doc_id) < NUM/DEN * 2^60
SAMPLE_DEN = 8
SAMPLE_THRESHOLD = (1 << 60) * SAMPLE_NUM // SAMPLE_DEN


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/8 corpus sample: keep documents whose salted 60-bit
    hash falls under an exact integer threshold. No RNG state, no
    partitioning dependence — the same doc set is selected on any cluster
    size, which is what makes train/eval splits reproducible at 100 TB.
    Emits the sampled rows with their stratum keys (lang, source) so
    downstream per-stratum accounting is a plain groupBy."""
    d = _documents(spark, sf_dir)
    h = hash60(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "lang", "source", h.alias("h"))
        .where(F.col("h") < F.lit(SAMPLE_THRESHOLD))
        .select("doc_id", "lang", "source")
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_hash60(f"'{SAMPLE_SALT}' || doc_id::VARCHAR")}
      < {SAMPLE_THRESHOLD}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# vocab_stats — corpus-level term/document frequency, top-K
# ---------------------------------------------------------------------------

VOCAB_TOPK = 200


def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus vocabulary by collection frequency, with exact document
    frequency. Two stacked aggregations — (term, doc_id) then term — so
    the exact-distinct is a pair-count, not a count(DISTINCT) holding all
    doc_ids per term; both stages partial-combine map-side, and the top-K
    is a TakeOrdered (per-partition heap + driver merge), not a sort."""
    d = _documents(spark, sf_dir)
    toks = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    stats = per_doc.groupBy("term").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count("*").cast("long").alias("df"),
    )
    return stats.orderBy(F.desc("tf"), F.asc("term")).limit(VOCAB_TOPK)


VOCAB_STATS_SQL = f"""
WITH {SQL_TOKS.strip()},
per_doc AS (
  SELECT term, doc_id, count(*) AS c FROM toks2 GROUP BY 1, 2
)
SELECT term, sum(c)::BIGINT AS tf, count(*)::BIGINT AS df
FROM per_doc
GROUP BY term
ORDER BY tf DESC, term ASC
LIMIT {VOCAB_TOPK}
"""


# ---------------------------------------------------------------------------
# span_dedup — C4-style cross-document duplicate-span metrics
# ---------------------------------------------------------------------------

SPAN_K = 5  # token span length (C4 dedups three-sentence spans; token
            # spans are the tokenizer-level analogue this corpus supports)


def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how many of its distinct SPAN_K-token spans occur in
    at least one OTHER document (C4, Raffel et al. 2020 §2.2 dedups
    exactly such repeated spans corpus-wide). Spans travel as 60-bit
    hashes; a span shared by n docs costs n rows plus one count row —
    never a pair explosion."""
    d = _documents(spark, sf_dir)
    sh = (
        d.select("doc_id", F.explode(_grams(tokens_col(), SPAN_K)).alias("g"))
        .select("doc_id", hash60(F.col("g")).alias("h"))
        .distinct()
    )
    ndocs = sh.groupBy("h").agg(F.count("*").alias("nd"))
    per_doc = sh.join(ndocs, "h").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum((F.col("nd") > 1).cast("long")).cast("long").alias("n_shared"),
    )
    n_spans = F.coalesce("n_spans", F.lit(0)).cast("long")
    n_shared = F.coalesce("n_shared", F.lit(0)).cast("long")
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            n_spans.alias("n_spans"),
            n_shared.alias("n_shared"),
            F.when(n_spans > 0, q6(n_shared / n_spans))
            .otherwise(F.lit(0)).alias("shared_frac_q"),
        )
    )


SPAN_DEDUP_SQL = f"""
WITH {SQL_TOKARR.strip()},
sh AS (
  SELECT DISTINCT doc_id, {sql_hash60('g.gram')} AS h
  FROM (
    SELECT doc_id, unnest({_sql_grams(SPAN_K)}) AS gram FROM tokarr
  ) g
),
ndocs AS (SELECT h, count(*) AS nd FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, count(*)::BIGINT AS n_spans,
         sum(CASE WHEN n.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
  FROM sh JOIN ndocs n ON sh.h = n.h
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_spans, 0)::BIGINT AS n_spans,
       coalesce(p.n_shared, 0)::BIGINT AS n_shared,
       CASE WHEN coalesce(p.n_spans, 0) > 0
            THEN {sql_q6('p.n_shared / p.n_spans')} ELSE 0 END
         AS shared_frac_q
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# domain_stats — per-source corpus accounting
# ---------------------------------------------------------------------------

def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source domain: document/token counts, mean document length,
    distinct languages, and exact-duplicate documents (docs minus distinct
    60-bit text fingerprints). Domain-level accounting drives the
    keep/drop/downsample decisions crawl pipelines make before any
    per-document filter. Both distincts are stacked aggregations, not
    count(DISTINCT) over collected sets."""
    d = _documents(spark, sf_dir)
    base = d.select(
        "source", "lang",
        F.size(tokens_col()).cast("long").alias("nt"),
        hash60(F.col("text")).alias("fp"),
    )
    fp_stats = (
        base.groupBy("source", "fp")
        .agg(F.count("*").alias("c"), F.sum("nt").alias("snt"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum("snt").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_uniq_fp"),
        )
    )
    langs = (
        d.select("source", "lang").distinct()
        .groupBy("source").agg(F.count("*").cast("long").alias("n_langs"))
    )
    return fp_stats.join(langs, "source").select(
        "source", "n_docs", "n_tokens",
        q6(F.col("n_tokens") / F.col("n_docs")).alias("avg_len_q"),
        "n_langs",
        (F.col("n_docs") - F.col("n_uniq_fp")).cast("long")
        .alias("dup_docs"),
    )


DOMAIN_STATS_SQL = f"""
WITH base AS (
  SELECT source, lang,
         len(list_filter(string_split_regex(lower(text), '[^0-9a-z]+'),
                         x -> x <> ''))::BIGINT AS nt,
         {sql_hash60('text')} AS fp
  FROM documents
),
fp1 AS (
  SELECT source, fp, count(*) AS c, sum(nt) AS snt
  FROM base GROUP BY 1, 2
),
fps AS (
  SELECT source, sum(c)::BIGINT AS n_docs, sum(snt)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_uniq_fp
  FROM fp1 GROUP BY 1
),
langs AS (
  SELECT source, count(*)::BIGINT AS n_langs
  FROM (SELECT DISTINCT source, lang FROM documents) GROUP BY 1
)
SELECT f.source, f.n_docs, f.n_tokens,
       {sql_q6('f.n_tokens / f.n_docs')} AS avg_len_q,
       l.n_langs,
       (f.n_docs - f.n_uniq_fp)::BIGINT AS dup_docs
FROM fps f JOIN langs l ON f.source = l.source
ORDER BY f.source
"""


# ---------------------------------------------------------------------------
# unigram_logprob — perplexity-filter proxy over a corpus unigram LM
# ---------------------------------------------------------------------------

LOGP_SCALE = 1_000_000  # per-term log-prob quantum (int64 before summing)


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average token log-probability under the corpus's own unigram LM —
    the relational core of a perplexity filter (CCNet, Wenzek et al. 2020
    scores pages with a 5-gram LM; the unigram version has the identical
    dataflow: term table -> join -> per-doc reduce). Per-term log-probs
    are quantized to int64 BEFORE the per-doc sum, so the doc score is an
    exact integer sum with no float summation-order dependence."""
    d = _documents(spark, sf_dir)
    tfpd = (
        d.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    )
    vocab = tfpd.groupBy("term").agg(F.sum("c").cast("long").alias("tf"))
    total = vocab.agg(F.sum("tf").cast("double").alias("total_tf"))
    qlp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.floor(
            F.log(F.col("tf").cast("double") / F.col("total_tf"))
            * F.lit(float(LOGP_SCALE))
        ).cast("long").alias("qlp"),
    )
    scored = tfpd.join(qlp, "term").groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("qlp")).cast("long").alias("s"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.floor(F.col("s").cast("double") / F.col("n_tokens"))
                .cast("long"),
            ).otherwise(F.lit(0)).alias("avg_logp_q"),
        )
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH {SQL_TOKS.strip()},
tfpd AS (
  SELECT doc_id, term, count(*)::BIGINT AS c FROM toks2 GROUP BY 1, 2
),
vocab AS (SELECT term, sum(c)::BIGINT AS tf FROM tfpd GROUP BY 1),
tot AS (SELECT sum(tf)::DOUBLE AS total_tf FROM vocab),
qlpt AS (
  SELECT term,
         floor(ln(tf::DOUBLE / t.total_tf) * {LOGP_SCALE})::BIGINT AS qlp
  FROM vocab CROSS JOIN tot t
),
scored AS (
  SELECT tfpd.doc_id, sum(tfpd.c * q.qlp)::BIGINT AS s,
         sum(tfpd.c)::BIGINT AS n_tokens
  FROM tfpd JOIN qlpt q ON tfpd.term = q.term
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens,
       CASE WHEN coalesce(sc.n_tokens, 0) > 0
            THEN floor(sc.s / sc.n_tokens)::BIGINT ELSE 0 END AS avg_logp_q
FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# pii_scrub — regex PII detection + redaction fingerprint
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \\b.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM_RE = r"\d{9,}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact the three PII shapes every curation pipeline
    scrubs (emails, IPv4 addresses, >=9-digit runs: phone/account/SSN-like
    ids). Emits counts plus the 60-bit fingerprint of the redacted text —
    the full redacted body never shuffles, downstream stages re-derive it
    map-side from the same deterministic replacement order."""
    d = _documents(spark, sf_dir)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>"),
        PII_LONGNUM_RE, "<NUM>")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE))
        .cast("long").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4_RE))
        .cast("long").alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(PII_LONGNUM_RE))
        .cast("long").alias("n_longnum"),
        hash60(red).alias("clean_fp"),
    )


PII_SCRUB_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '{PII_IPV4_RE}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{PII_LONGNUM_RE}'))::BIGINT
         AS n_longnum,
       {sql_hash60(
           "regexp_replace(regexp_replace(regexp_replace(text, "
           f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
           f"'{PII_IPV4_RE}', '<IP>', 'g'), "
           f"'{PII_LONGNUM_RE}', '<NUM>', 'g')"
       )} AS clean_fp
FROM documents
ORDER BY doc_id
"""


SPARK_QUERIES = {
    "text_repetition": text_repetition,
    "quality_filter": quality_filter,
    "decontaminate": decontaminate,
    "sample_stratified": sample_stratified,
    "vocab_stats": vocab_stats,
    "span_dedup": span_dedup,
    "domain_stats": domain_stats,
    "unigram_logprob": unigram_logprob,
    "pii_scrub": pii_scrub,
}

ORACLE_SQLS = {
    "text_repetition": TEXT_REPETITION_SQL,
    "quality_filter": QUALITY_FILTER_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "vocab_stats": VOCAB_STATS_SQL,
    "span_dedup": SPAN_DEDUP_SQL,
    "domain_stats": DOMAIN_STATS_SQL,
    "unigram_logprob": UNIGRAM_LOGPROB_SQL,
    "pii_scrub": PII_SCRUB_SQL,
}
