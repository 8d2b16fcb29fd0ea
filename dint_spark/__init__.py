"""dint_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of the DINT reference engine (dictionary-based
posting-list compression, WSDM'19 "Fast Dictionary-based Compression for
Inverted Indexes") as an idiomatic Spark pipeline:

  pages (url, warc_ts, html, text, lang)
    -> tokenize (vectorized, deterministic)
    -> postings(term_id, doc_ids[], freqs[])        [salted skew-aware shuffle]
    -> DINT pattern dictionary (DSF selection)       [Spark agg + driver pack]
    -> segments(term_id, payload, block metadata)    [term-range partitioned]
    -> BM25 top-k retrieval (ranked OR/AND, WAND, block-max WAND, MaxScore)

All heavy per-element compute lives in vectorized numpy inside Arrow-batched
pandas UDFs; all dataflow is pyspark.sql DataFrames (no RDDs, no per-row
Python UDFs).
"""

__version__ = "0.2.1"

from dint_spark.bm25 import BM25  # noqa: F401
