"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Includes the flagship frontier-crawl throughput (urls/sec over a synthetic
seed-expansion frontier) alongside the operator queries. Scaling-efficiency
evidence (local[8] vs local[32]) lives in scripts/scaling_bench.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "top_hosts",
    "frontier_topk_per_host",
    "priority_schedule",
    "url_admission",
    "url_normalize_hosts",
    "batch_dedup_stable",
    "dedup_exact",
    "simhash_near_dup",
    "minhash_near_dup",
    "ngram_jaccard",
    "link_pagerank_topk",
    "token_counts",
    "real_bpe_token_counts",
    "quality_scores",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "near_dup_cross_check",
    "span_extraction",
    "events_daily_rollup",
]


def _materialize(df) -> int:
    """Full materialization without driver collect (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    import __spark_entry__ as entry
    from crawler_distributed_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=CPUS)
    qs = entry.queries()
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths once (excluded from timings)
    qs["pricing_summary"](spark, SF_DIR).count()

    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # ANN at production dims (VERDICT r4 #7): 10^5 vectors × dim 768,
    # generated DISTRIBUTED (no driver rows), 16 queries, IVF top-10.
    # The dim-256 plan audit says the plan survives; this measures the
    # wall-clock at real embedding width.
    from pyspark.sql import functions as F

    from crawler_distributed_spark.pipelines.similarity import (
        ivf_topk,
        synthetic_embeddings,
    )

    c768 = synthetic_embeddings(spark, 100_000, 768)
    q768 = c768.where(F.col("vec_id") % 6250 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    _materialize(
        # kernel="auto" → the Arrow matmul kernel above dim 256 (the
        # scale path); the SQL kernel stays the hash-gated oracle path
        ivf_topk(
            c768, q768, dim=768, k=10, n_centroids=64, nprobe=8, kernel="auto"
        )
    )
    dt = time.time() - t0
    timings["ann_ivf_dim768"] = round(dt, 3)
    total += dt

    # flagship: frontier crawl throughput on a wide synthetic web
    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy

    # throughput-representative config: wide host fan-out, few fat waves
    # (see BENCH/BASELINE.md; reference-politeness quota-4 numbers there)
    cfg = synth.SynthConfig(n_hosts=20000, pages_base=100, hot_factor=10, branching=8)
    seeds = synth.seed_rows(cfg, max_pages=24)
    policy = CrawlPolicy(
        quota_per_host=24, checkpoint_every=8, max_attempts=1, backoff_cap=2,
        count_scheduled_in_budget=True,
    )
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        res = run_crawl(spark, cfg, seeds, robots, d, policy)
        # fresh runs carry the trace row count as an observe() metric
        # accumulated on the batch writes — no final O(n) count job
        oh = res.out_hashes
        n_trace = oh["trace_rows"] if oh else res.trace(spark).count()
    crawl_dt = time.time() - t0
    timings["crawl_synthetic"] = round(crawl_dt, 3)
    total += crawl_dt

    out = {
        "metric": "headline_queries_plus_crawl_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "crawl_urls_fetched": n_trace,
        "crawl_urls_per_sec": round(n_trace / crawl_dt, 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
