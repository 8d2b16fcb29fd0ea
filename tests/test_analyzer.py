"""Analyzer chain: the Spark expression path, the Python replica, and
end-to-end analyzed retrieval must agree exactly.

  - s_stem pins the three Harman rules and their exception lists;
  - analyzed_text (JVM CASE chain) == analyze (Python) token-for-token
    on a corpus of tricky words (every rule + every exception + the
    's' -> empty edge);
  - an index built over analyze_documents ranks analyzed queries
    identically to a brute-force BM25 over Python-analyzed token lists
    (plural query forms match singular corpus forms and vice versa).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from dint_spark.analyzer import (STOPWORDS, analyze, analyze_documents,
                                 analyzed_text, s_stem)

TRICKY = ("queries policies skies babies eies aies monies "
          "caches matches classes buses boxes shoes goes aes sees trees "
          "tables values joins rows s ss us bus kiss miss corpus "
          "the and with into a is it "
          "query table value join row glass")


def test_s_stem_rules():
    assert s_stem("queries") == "query"
    assert s_stem("policies") == "policy"
    assert s_stem("aies") == "aies"          # -aies exception
    assert s_stem("eies") == "eies"          # -eies exception
    assert s_stem("caches") == "cache"       # -es -> drop s
    assert s_stem("shoes") == "shoes"        # -oes exception
    assert s_stem("sees") == "sees"          # -ees exception
    assert s_stem("aes") == "aes"            # -aes exception
    assert s_stem("joins") == "join"         # -s -> drop
    assert s_stem("bus") == "bus"            # -us exception
    assert s_stem("kiss") == "kiss"          # -ss exception
    assert s_stem("s") == ""                 # bare 's' stems to empty
    assert s_stem("row") == "row"            # untouched


def test_spark_chain_matches_python(spark):
    df = spark.createDataFrame([(0, TRICKY)], "doc_id long, text string")
    got = df.select(analyzed_text("text").alias("t")).collect()[0]["t"]
    assert got.split() == analyze(TRICKY)
    # and the stopwords really dropped
    assert not set(got.split()) & set(STOPWORDS)


@pytest.fixture(scope="module")
def adocs(spark):
    rng = np.random.default_rng(31)
    base = ["query", "queries", "table", "tables", "value", "values",
            "join", "joins", "row", "rows", "cache", "caches", "bus",
            "kiss", "glass", "the", "and", "with", "scan", "merge",
            "merges", "policy", "policies"]
    rows = []
    for d in range(200):
        n = int(rng.integers(6, 30))
        rows.append((d, " ".join(rng.choice(base, size=n)), "en"))
    return rows


def test_analyzed_retrieval_matches_brute(spark, tmp_path_factory, adocs):
    from dint_spark.corpus import pages_from_documents
    from dint_spark.index import IndexConfig, build_index
    from dint_spark.queries import run_queries
    from dint_spark.search import parse_queries

    docs = spark.createDataFrame(
        adocs, "doc_id long, text string, lang string")
    out = str(tmp_path_factory.mktemp("idx") / "analyzed")
    idx = build_index(spark, pages_from_documents(analyze_documents(docs)),
                      out, IndexConfig(num_buckets=2, input_tag="an"))

    queries = ["the queries", "tables and values", "join rows",
               "policy caches", "bus kiss the"]
    specs, _ = parse_queries(idx, [" ".join(analyze(q)) for q in queries])
    # rank in quantized space like the oracle gate (raw-float kernel
    # order can differ from quantized order exactly at a tie)
    raw = {}
    for r in run_queries(spark, idx, specs, algo="ranked_or", k=50,
                         dtype="float64").collect():
        raw.setdefault(r["query_id"], []).append(
            (-math.floor(r["score"] * 1e9), r["doc_id"]))
    got = {}
    for qid, rows in raw.items():
        rows.sort()
        got[qid] = [(i + 1, d, -nsq)
                    for i, (nsq, d) in enumerate(rows[:5])]

    # brute over Python-analyzed token lists
    toks = [analyze(t) for _, t, _ in adocs]
    n = len(toks)
    lens = np.array([len(t) for t in toks], dtype=np.float64)
    avg = lens.sum() / n
    tfs = [Counter(t) for t in toks]
    dfc = Counter()
    for c in tfs:
        dfc.update(set(c))
    for qid, q in enumerate(queries):
        qtoks = Counter(analyze(q))
        rows = []
        for d, c in enumerate(tfs):
            s, hit = 0.0, False
            for w, qf in sorted(qtoks.items()):
                tf = c.get(w, 0)
                if not tf or not dfc[w]:
                    continue
                hit = True
                idf = math.log((n - dfc[w] + 0.5) / (dfc[w] + 0.5))
                s += (qf * max(1e-6, idf) * (1.0 + 1.2)
                      * (tf / (tf + 1.2 * (0.5 + 0.5 * (lens[d] / avg)))))
            if hit:
                rows.append((-math.floor(s * 1e9), d))
        rows.sort()
        want = [(i + 1, d, -nsq) for i, (nsq, d) in enumerate(rows[:5])]
        assert sorted(got.get(qid, [])) == want, (qid, q)
