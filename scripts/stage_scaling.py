"""Per-stage scaling microbench: fetch UDF and admission pipeline at one
parallelism level, isolated from the batch loop (no checkpoint I/O, no
driver orchestration). Prints ONE JSON line.

Run at --cpus 2 and --cpus 8 (fresh process each) and compare: the
CPU-bound Arrow fetch stage is the engine's parallel core; admission is
shuffle/memory-bandwidth-bound and shares one memory bus in local mode.

Usage: python scripts/stage_scaling.py --cpus 8 [--urls 120000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--hosts", type=int, default=2500)
    p.add_argument("--pages-base", type=int, default=48)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.operators.admission import (
        admit,
        aggregate_robots_rules,
    )
    from crawler_distributed_spark.operators.fetch import fetch_scheduled
    from crawler_distributed_spark.session import get_spark

    cfg = synth.SynthConfig(
        n_hosts=args.hosts, pages_base=args.pages_base, hot_factor=1, branching=8
    )
    spark = get_spark(app_name=f"stage-scaling-{args.cpus}", cpus=args.cpus)

    urls = synth.all_urls(cfg)
    rows = [(f"crawl-{u.split('/')[2]}", u) for u in urls]
    scheduled = (
        spark.createDataFrame(rows, "crawl_id string, url_norm string")
        .withColumn("url_hash", F.xxhash64("url_norm"))
        .withColumn("host", F.regexp_extract("url_norm", r"^https://([^/]*)", 1))
        .withColumn("depth", F.lit(1))
        .withColumn("discovery_seq", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    n_urls = scheduled.count()

    # --- stage A: fetch UDF (python-CPU-bound, Arrow-batched)
    t0 = time.time()
    fetched = fetch_scheduled(scheduled, cfg)
    fetched.write.format("noop").mode("overwrite").save()
    t_fetch = time.time() - t0

    # --- stage B: admission (JVM regex filters + canonicalize UDF +
    # dedup shuffle + anti-join + robots broadcast)
    fetched_ck = fetch_scheduled(scheduled, cfg).localCheckpoint()
    candidates = (
        fetched_ck.where(F.size("outlinks") > 0)
        .select(
            "crawl_id",
            F.col("discovery_seq").alias("parent_seq"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("outlinks").alias("link_idx", "raw_url"),
        )
        .withColumn("priority_score", F.lit(0.0))
        .withColumn("allowed_host_1", F.col("crawl_id").substr(7, 99))
        .withColumn(
            "allowed_host_2", F.concat(F.lit("www."), F.col("crawl_id").substr(7, 99))
        )
        .localCheckpoint()
    )
    n_cand = candidates.count()
    seen = scheduled.select("crawl_id", "url_norm")
    robots = aggregate_robots_rules(
        spark.createDataFrame(synth.robots_rule_rows(cfg))
    ).cache()
    robots.count()
    t0 = time.time()
    admit(candidates, seen, robots).write.format("noop").mode("overwrite").save()
    t_admit = time.time() - t0

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "n_urls": n_urls,
                "n_candidates": n_cand,
                "fetch_sec": round(t_fetch, 2),
                "fetch_urls_per_sec": round(n_urls / t_fetch, 1),
                "admit_sec": round(t_admit, 2),
                "admit_cands_per_sec": round(n_cand / t_admit, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
