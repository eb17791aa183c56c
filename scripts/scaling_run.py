"""One scaling-bench run: the flagship crawl at a given parallelism.

Prints one JSON line with elapsed, urls fetched, throughput, and
order-insensitive output hashes (trace + seen) so the orchestrator
(scripts/scaling_bench.py) can assert bit-identical outputs across
parallelism levels.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--hosts", type=int, default=30000)
    p.add_argument("--pages-base", type=int, default=40)
    p.add_argument("--hot-factor", type=int, default=10)
    p.add_argument("--branching", type=int, default=8)
    p.add_argument("--max-pages", type=int, default=24)
    p.add_argument("--quota", type=int, default=12)
    p.add_argument("--max-attempts", type=int, default=1)
    p.add_argument("--backoff-cap", type=int, default=2)
    p.add_argument("--budget-scheduled", action="store_true")
    p.add_argument("--master", default=None, help="e.g. spark://127.0.0.1:7077")
    p.add_argument("--exec-cores", type=int, default=6)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy
    from crawler_distributed_spark.session import get_spark

    cfg = synth.SynthConfig(
        n_hosts=args.hosts, pages_base=args.pages_base,
        hot_factor=args.hot_factor, branching=args.branching,
    )
    seeds = synth.seed_rows(cfg, max_pages=args.max_pages)
    policy = CrawlPolicy(quota_per_host=args.quota, checkpoint_every=8,
                         max_attempts=args.max_attempts, backoff_cap=args.backoff_cap,
                         count_scheduled_in_budget=args.budget_scheduled)
    extra = {}
    if args.master:
        extra["spark.executor.cores"] = str(args.exec_cores)
    spark = get_spark(app_name=f"scaling-{args.cpus}", cpus=args.cpus,
                      master=args.master, extra_conf=extra)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))

    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        res = run_crawl(spark, cfg, seeds, robots, d, policy)
        if res.out_hashes is not None:
            # fresh complete run: hashes were XOR-accumulated batch-by-batch
            # as observe() metrics on writes that ran anyway — zero extra
            # jobs here (the r4 floor-cut: the final O(total-urls) trace +
            # seen scans are gone; equality with the scans is pinned by
            # tests/test_trace_equality.py::test_out_hashes_match_full_scan)
            oh = res.out_hashes
            n_trace, trace_hash = oh["trace_rows"], oh["trace_hash"]
            n_seen, seen_hash = oh["seen_rows"], oh["seen_hash"]
        else:
            agg = res.trace(spark).agg(
                F.count("*").alias("n"),
                F.expr(
                    "bit_xor(xxhash64(crawl_id, batch_id, seq_in_batch, url_norm, depth))"
                ).alias("trace_hash"),
            ).collect()[0]
            seen_agg = res.seen(spark).agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(crawl_id, url_norm))").alias("seen_hash"),
            ).collect()[0]
            n_trace, trace_hash = agg["n"], int(agg["trace_hash"])
            n_seen, seen_hash = seen_agg["n"], int(seen_agg["seen_hash"])
    elapsed = time.time() - t0

    print(json.dumps({
        "cpus": args.cpus,
        "elapsed_sec": round(elapsed, 2),
        "urls_fetched": n_trace,
        "urls_per_sec": round(n_trace / elapsed, 2),
        "trace_hash": trace_hash,
        "seen_urls": n_seen,
        "seen_hash": seen_hash,
        "last_batch": res.last_batch,
        "batch_seconds": res.batch_seconds,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
