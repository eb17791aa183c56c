"""Compaction evidence: per-batch wall time must stay flat over a long run.

Without seen-set compaction the per-batch anti-join reads O(#batches)
admitted-delta directories, so batch time grows linearly over a run
(O(N^2) total I/O — VERDICT r1). With storage.compact_seen the read is
O(compact_seen_every) files and batch time stays flat.

Runs a many-batch crawl (quota=1 stretches the same page budget over ~10x
more batches) and reports first-third vs last-third mean batch seconds.
Prints ONE JSON line; --assert-flat fails if the ratio exceeds the bound
(generous: this box's CPU credits make single-run timing noisy up to 3x).

Usage: python scripts/flat_batch_check.py [--batches 200] [--assert-flat]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--hosts", type=int, default=300)
    p.add_argument("--pages-base", type=int, default=80)
    p.add_argument("--max-pages", type=int, default=60)
    p.add_argument("--quota", type=int, default=1)
    p.add_argument("--max-batches", type=int, default=200)
    p.add_argument("--compact-every", type=int, default=16)
    p.add_argument("--assert-flat", action="store_true")
    p.add_argument("--flat-bound", type=float, default=2.0)
    args = p.parse_args()

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy
    from crawler_distributed_spark.session import get_spark

    cfg = synth.SynthConfig(
        n_hosts=args.hosts, pages_base=args.pages_base, hot_factor=2, branching=6
    )
    seeds = synth.seed_rows(cfg, max_pages=args.max_pages)
    policy = CrawlPolicy(
        quota_per_host=args.quota,
        max_batches=args.max_batches,
        checkpoint_every=4,
        compact_seen_every=args.compact_every,
        max_attempts=1,
    )
    spark = get_spark(app_name="flat-batch", cpus=args.cpus)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
    with tempfile.TemporaryDirectory() as d:
        res = run_crawl(spark, cfg, seeds, robots, d, policy)
        times = res.batch_seconds or []
    n = len(times)
    third = max(1, n // 3)
    head = statistics.mean(times[:third])
    tail = statistics.mean(times[-third:])
    out = {
        "batches": n,
        "head_mean_sec": round(head, 2),
        "tail_mean_sec": round(tail, 2),
        "tail_over_head": round(tail / head, 2) if head else None,
        "compact_every": args.compact_every,
        "batch_seconds": times,
    }
    print(json.dumps(out))
    spark.stop()
    if args.assert_flat and head and tail / head > args.flat_bound:
        print(f"FLATNESS FAIL: tail/head {tail / head:.2f} > {args.flat_bound}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
