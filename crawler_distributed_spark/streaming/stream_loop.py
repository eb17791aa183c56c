"""Structured Streaming drivers (SURVEY.md §2.9, §7 step 3).

Two surfaces:

1. ``stream_crawl`` — the frontier loop driven by a Structured Streaming
   ticker: a rate source fires micro-batches and ``foreachBatch`` advances
   one crawl batch per tick. The loop body and its commit discipline are
   exactly plans/frontier_loop.py's (the batch store is the state; a tick
   that crashes mid-batch is rolled back and replayed, so exactly-once
   falls out of the manifest protocol, not the streaming checkpoint).
   The reference has no event-time semantics to preserve — its "streaming"
   is a beanstalkd poll loop (crawler/worker/crawl_job_listener.py:126-360).

2. ``stream_events_rollup`` — a genuine event-time pipeline over an events
   stream (watermark + windowed aggregation), the pattern a training-data
   pipeline uses for click/impression-style feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import synth
from ..plans.frontier_loop import CrawlRunResult, run_crawl
from ..policy import CrawlPolicy


def stream_crawl(
    spark: SparkSession,
    cfg: synth.SynthConfig,
    seeds: list[dict],
    robots_rules: DataFrame,
    checkpoint_dir: str,
    policy: CrawlPolicy = CrawlPolicy(),
    max_ticks: int = 10_000,
    stop_after_batch: int | None = None,
    fetcher=None,
) -> CrawlRunResult:
    """Drive the crawl via a streaming ticker; returns when the frontier
    drains (or after max_ticks). Each tick advances at most one batch by
    calling run_crawl(resume=True, stop_after_batch=<next>). ``fetcher``
    passes through to run_crawl (the real-HTTP transport swap works under
    the streaming driver too).

    ``stop_after_batch`` is the deterministic kill switch (same contract
    as the batch loop's): the ticker refuses to start any batch past it,
    leaving a mid-crawl checkpoint a second ``stream_crawl`` on the same
    directory resumes from — the kill/resume equality gate in
    tests/test_streaming.py runs through this."""
    state = {"done": False, "result": None, "started": False}

    def tick(_df: DataFrame, _epoch: int) -> None:
        if state["done"]:
            return
        from ..storage import BatchStore

        store = BatchStore(checkpoint_dir)
        last = store.last_committed()
        resume = state["started"] or last is not None
        nxt = (last + 1) if last is not None else 0
        if stop_after_batch is not None and nxt > stop_after_batch:
            state["done"] = True
            return
        res = run_crawl(
            spark, cfg, seeds, robots_rules, checkpoint_dir, policy,
            resume=resume, stop_after_batch=nxt, fetcher=fetcher,
        )
        state["started"] = True
        state["result"] = res
        if res.last_batch < nxt:  # loop ended before reaching the tick target
            state["done"] = True

    ticker = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    q = (
        ticker.writeStream.foreachBatch(tick)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        ticks = 0
        while not state["done"] and ticks < max_ticks:
            time.sleep(0.2)
            ticks += 1
    finally:
        q.stop()
    return state["result"]


def stream_events_rollup(
    spark: SparkSession,
    events_path: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_rollup",
):
    """Event-time windowed rollup over a parquet-fed stream: watermarked
    count + sum(value) per (window, event_type). Returns the started query;
    callers use processAllAvailable() + spark.sql(f"SELECT * FROM {name}")
    for batch-complete smoke (memory sink)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        # parquet NTZ timestamps must become session-TZ timestamps before
        # they can carry a watermark
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    # complete mode so a one-shot availableNow run emits every window even
    # though the watermark never advances past the last event (append mode
    # would hold all windows open on a finite replay)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
