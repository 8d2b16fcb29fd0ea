"""Free-text query front end: pinned query tokenization + vocabulary
lookup + ranked retrieval.

The missing last step of the user story: raw query strings in, ranked
doc ids out. Query strings tokenize driver-side under the exact contract
the index was built with (tokenizer.TOKEN_SPLIT_RE: NFC optional ->
lower -> split -> drop empties), term ids resolve through a
pushed-filter scan of vocab.parquet (only the batch's distinct terms
return — never the vocabulary, which at web scale has 10^8+ terms and
must not be collected), and retrieval runs through the standard engines
(run_queries / run_phrase_queries_ranked), so filters, tombstones and
the served path all compose.

Out-of-vocabulary terms are dropped per query (standard web-search
behavior); a phrase containing an OOV term cannot match anywhere, so
phrase mode returns no rows for that query instead of silently matching
a shorter phrase.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dint_spark.queries import (DocMask, run_phrase_queries_ranked,
                                run_queries)
from dint_spark.tokenizer import TOKEN_SPLIT_RE

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def tokenize_query(text: str, nfc: bool = False) -> list[str]:
    """The index's pinned tokenizer applied to ONE query string,
    driver-side — queries are a few words; no Spark job."""
    if not text:
        return []
    if nfc:
        text = unicodedata.normalize("NFC", text)
    return [w for w in _SPLIT.split(text.lower()) if w]


def lookup_term_ids(index, terms) -> dict[str, int]:
    """term -> term_id for the given terms only, via a pushed-filter scan
    of vocab.parquet (`term IN (...)` reaches the parquet reader). The
    result is bounded by the query batch's distinct-term count, unlike
    Index.term_ids' full-vocab collect."""
    terms = sorted({t for t in terms if t})
    if not terms:
        return {}
    rows = (index.vocab()
            .filter(F.col("term").isin(terms))
            .select("term", "term_id").collect())
    return {r["term"]: int(r["term_id"]) for r in rows}


def parse_queries(index, queries: list[str], nfc: bool = False
                  ) -> tuple[list[list[int]], list[list[str]]]:
    """Query strings -> (specs, oov): specs[i] is query i's term-id list
    in token order (repeats kept — they become qf weight downstream, or
    phrase positions in phrase mode); oov[i] lists its dropped tokens."""
    toks = [tokenize_query(q, nfc=nfc) for q in queries]
    tid = lookup_term_ids(index, [t for ts in toks for t in ts])
    specs = [[tid[t] for t in ts if t in tid] for ts in toks]
    oov = [[t for t in ts if t not in tid] for ts in toks]
    return specs, oov


def search_text(
    spark: SparkSession,
    index,
    queries: list[str],
    algo: str = "block_max_wand_vec",
    k: int = 10,
    dtype: str = "float32",
    phrase: bool = False,
    nfc: bool = False,
    doc_filter: DocMask | None = None,
) -> DataFrame:
    """Ranked retrieval for raw query strings; query_id = position in
    ``queries``. ``phrase=True`` requires the exact consecutive phrase
    (positional index) and ranks matches by BM25 of the phrase's terms;
    a query whose every term is OOV (or, in phrase mode, with ANY OOV
    term) yields no rows. Returns (query_id, rank, doc_id, score)."""
    specs, oov = parse_queries(index, queries, nfc=nfc)
    if phrase:
        specs = [([] if o else s) for s, o in zip(specs, oov)]
        return run_phrase_queries_ranked(spark, index, specs, k=k,
                                         dtype=dtype, doc_filter=doc_filter)
    return run_queries(spark, index, specs, algo=algo, k=k, dtype=dtype,
                       doc_filter=doc_filter)
