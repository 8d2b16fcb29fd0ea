"""Physical-plan audit: capture .explain("formatted") for the engine's key
dataflows and assert/record the scale-critical plan properties:

  1. query batch: the segments parquet scan must carry PushedFilters on
     term_id (row-group pruning via the IN-list) and prune columns
  2. postings build: the (term, doc) aggregation must be a partial+final
     hash aggregate (map-side combine before the shuffle)
  3. ops projections (e.g. text_quality) must read only the needed columns

Writes PLANS.md with the captured plans + a PASS/FAIL summary line each.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from dint_spark.corpus import pages_from_documents
    from dint_spark.index import IndexConfig, build_index, load_index
    from dint_spark.postings import build_postings, term_doc_freqs
    from dint_spark.session import get_spark
    from dint_spark.tokenizer import assign_doc_ids, build_vocab, doclens, tokenize

    spark = get_spark("explain_audit")
    out_dir = "/tmp/dint_plan_audit_idx"
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    pages = pages_from_documents(docs)
    if not os.path.exists(os.path.join(out_dir, "manifest.json")):
        build_index(spark, pages, out_dir, IndexConfig(num_buckets=4,
                                                       input_tag="audit"))
    idx = load_index(spark, out_dir)

    sections: list[tuple[str, str, bool, str]] = []

    # 1. query batch scan pruning
    from dint_spark.queries import run_queries

    q = run_queries(spark, idx, [[0, 3, 7], [1, 2]], algo="block_max_wand")
    p1 = plan_of(q)
    ok1 = "PushedFilters" in p1 and "term_id" in p1.split("PushedFilters", 1)[1][:400]
    sections.append((
        "Query batch: segments scan pruning",
        p1,
        ok1,
        "segments parquet scan lists term_id filters in PushedFilters "
        "(row-group pruning; replaces the reference's EF endpoint index)",
    ))

    # 2. postings build: partial hash agg before the shuffle
    toks = assign_doc_ids(tokenize(pages)).select("doc_id", "tokens")
    vocab = build_vocab(toks)
    dl = doclens(toks)
    post = build_postings(term_doc_freqs(toks, vocab), dl)
    p2 = plan_of(post)
    ok2 = "HashAggregate" in p2 and p2.count("HashAggregate") >= 2
    sections.append((
        "Postings build: map-side combine",
        p2,
        ok2,
        "tf aggregation shows partial+final HashAggregate pairs (map-side "
        "combine bounds the shuffle by distinct (term, doc) per task)",
    ))

    # 3. ops column pruning
    from dint_spark.ops.textstats import text_quality

    p3 = plan_of(text_quality(spark, SF))
    ok3 = "ReadSchema" in p3 and "text" in p3 and "source" not in p3.split(
        "ReadSchema", 1)[1][:300]
    sections.append((
        "text_quality: column pruning",
        p3,
        ok3,
        "documents scan ReadSchema contains only doc_id/text (lang/source/"
        "n_chars pruned)",
    ))

    md = ["# PLANS — physical-plan audit (scale-critical properties)\n"]
    for title, plan, ok, why in sections:
        md.append(f"## {title} — {'PASS' if ok else 'FAIL'}\n\n{why}\n")
        md.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(md))
    print("\n".join(f"{'PASS' if ok else 'FAIL'}: {t}" for t, _, ok, _ in sections))
    spark.stop()


if __name__ == "__main__":
    main()
