"""Builder-side isolation bench (guide §1.4): times individual bench
entries with the noop sink, min-of-N, without touching the frozen
bench.py. Usage:

  python bench_extra.py [-n REPEATS] [name ...]

Names: any BENCH_QUERIES entry, plus "ann_ivf_dim768" and
"crawl_synthetic" (same configs as bench.py). Prints one JSON line
{"queries_min": {...}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_query(spark, name: str) -> float:
    import __spark_entry__ as entry

    from pyspark.sql import functions as F

    if name == "ann_ivf_dim768":
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
            ivf_topk(c768, q768, dim=768, k=10, n_centroids=64, nprobe=8,
                     kernel="auto")
        )
        return time.time() - t0
    if name == "crawl_synthetic":
        from crawler_distributed_spark import synth
        from crawler_distributed_spark.plans.frontier_loop import run_crawl
        from crawler_distributed_spark.policy import CrawlPolicy

        cfg = synth.SynthConfig(
            n_hosts=20000, pages_base=100, hot_factor=10, branching=8
        )
        seeds = synth.seed_rows(cfg, max_pages=24)
        policy = CrawlPolicy(
            quota_per_host=24, checkpoint_every=8, max_attempts=1,
            backoff_cap=2, count_scheduled_in_budget=True,
        )
        robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
        t0 = time.time()
        with tempfile.TemporaryDirectory() as d:
            res = run_crawl(spark, cfg, seeds, robots, d, policy)
            oh = res.out_hashes
            n = oh["trace_rows"] if oh else res.trace(spark).count()
        dt = time.time() - t0
        print(f"  [crawl] {n} urls, batch_seconds={res.batch_seconds}",
              file=sys.stderr)
        return dt

    qs = entry.queries()
    t0 = time.time()
    _materialize(qs[name](spark, SF_DIR))
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from crawler_distributed_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cpus=CPUS)
    if not args.no_warm:
        entry.queries()["pricing_summary"](spark, SF_DIR).count()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for i in range(args.n):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            dt = run_query(spark, name)
            samples[name].append(round(dt, 3))
            print(f"  {name}[{i}] = {dt:.3f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    out = {
        "queries_min": {n: min(v) for n, v in samples.items()},
        "samples": samples,
        "sf": SF_DIR,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
