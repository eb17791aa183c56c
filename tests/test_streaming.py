"""Structured Streaming surfaces: ticker-driven crawl + event-time rollup."""

from pyspark.sql import functions as F

from crawler_distributed_spark import synth
from crawler_distributed_spark.oracle import run_oracle
from crawler_distributed_spark.policy import CrawlPolicy
from crawler_distributed_spark.streaming.stream_loop import (
    stream_crawl,
    stream_events_rollup,
)

CFG = synth.SynthConfig(n_hosts=2, pages_base=8, hot_factor=2, branching=4)
SEEDS = synth.seed_rows(CFG, max_pages=5)


def test_stream_crawl_matches_oracle(spark, tmp_path):
    robots = spark.createDataFrame(synth.robots_rule_rows(CFG))
    res = stream_crawl(spark, CFG, SEEDS, robots, str(tmp_path / "ck"), CrawlPolicy())
    assert res is not None
    oracle = run_oracle(CFG, SEEDS, CrawlPolicy())
    trace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in res.trace(spark).collect()
    )
    assert trace == sorted(oracle.trace)


def test_stream_events_rollup(spark, tmp_path):
    import os

    path = "/root/testdata/sf0.001/events.parquet"
    # the streaming file source wants a directory; point one at the file
    stream_dir = tmp_path / "events"
    stream_dir.mkdir()
    os.symlink(path, stream_dir / "events.parquet")
    schema = spark.read.parquet(path).schema
    q = stream_events_rollup(spark, str(stream_dir), schema, query_name="ev_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_test").collect()
    assert got
    # oracle: same rollup as a plain batch query
    want = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in spark.read.parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
        .collect()
    }
    got_map = {(r.window_start, r.event_type): (r.n, r.total) for r in got}
    assert got_map == want
