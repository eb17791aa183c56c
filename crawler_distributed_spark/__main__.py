"""CLI driver: run a synthetic crawl end-to-end.

Ship vehicle per the north rule:

    spark-submit --py-files crawler_distributed_spark.zip \
        -m crawler_distributed_spark  (or: python -m crawler_distributed_spark)

Prints one JSON summary line; state/trace/lineage land in --checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawler_distributed_spark")
    p.add_argument("--checkpoint", required=True, help="checkpoint/state dir")
    p.add_argument("--cpus", type=int, default=8, help="local[N] parallelism")
    p.add_argument("--hosts", type=int, default=4)
    p.add_argument("--pages-base", type=int, default=20)
    p.add_argument("--hot-factor", type=int, default=3)
    p.add_argument("--branching", type=int, default=5)
    p.add_argument("--max-pages", type=int, default=12)
    p.add_argument("--quota", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--stop-after-batch", type=int, default=None)
    p.add_argument("--verify-oracle", action="store_true",
                   help="also run the pure-Python oracle and compare")
    args = p.parse_args(argv)

    from . import synth
    from .plans.frontier_loop import run_crawl
    from .policy import CrawlPolicy
    from .session import get_spark

    cfg = synth.SynthConfig(
        n_hosts=args.hosts, pages_base=args.pages_base,
        hot_factor=args.hot_factor, branching=args.branching,
    )
    seeds = synth.seed_rows(cfg, max_pages=args.max_pages)
    policy = CrawlPolicy(quota_per_host=args.quota)
    spark = get_spark(cpus=args.cpus)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))

    t0 = time.time()
    res = run_crawl(
        spark, cfg, seeds, robots, args.checkpoint, policy,
        resume=args.resume, stop_after_batch=args.stop_after_batch,
    )
    elapsed = time.time() - t0

    trace = res.trace(spark)
    n_trace = trace.count()
    seen_df = res.seen(spark)
    n_seen = seen_df.count()
    out = {
        "last_batch": res.last_batch,
        "pages_crawled": res.pages_dict(spark),
        "trace_rows": n_trace,
        "seen_urls": n_seen,
        "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(n_trace / elapsed, 2) if elapsed else None,
    }

    if args.verify_oracle:
        from .oracle import run_oracle

        orc = run_oracle(cfg, seeds, policy)
        etrace = sorted(
            (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
            for r in trace.collect()
        )
        otrace = sorted(orc.trace)
        eseen: dict[str, set] = {}
        for r in seen_df.collect():
            eseen.setdefault(r.crawl_id, set()).add(r.url_norm)
        out["oracle_trace_match"] = etrace == otrace
        out["oracle_seen_match"] = eseen == orc.seen

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
