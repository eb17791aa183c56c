"""Dump .explain("formatted") for declared queries to plans/r06/.

Usage: python scripts/dump_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" -> plans/r06/<query>_<suffix>.txt
  With no query names, dumps every bench query (crawl queries excluded —
  run_crawl executes eagerly; its plan shape is asserted by
  scripts/explain_audit.py instead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r06")

# bench queries whose plan is a lazy DataFrame (crawl_* run eagerly)
DEFAULT = [
    "pricing_summary", "top_hosts", "frontier_topk_per_host",
    "priority_schedule", "url_admission", "url_normalize_hosts",
    "batch_dedup_stable", "dedup_exact", "simhash_near_dup",
    "minhash_near_dup", "ngram_jaccard", "link_pagerank_topk",
    "token_counts", "real_bpe_token_counts", "quality_scores",
    "ann_cosine_topk", "ann_ivf_topk", "near_dup_cross_check",
    "span_extraction", "events_daily_rollup",
]


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as entry
    from crawler_distributed_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = entry.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
