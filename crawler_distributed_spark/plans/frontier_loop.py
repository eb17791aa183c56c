"""The frontier iteration loop — batch-mode BFS crawl (SURVEY.md §3.1).

Replaces the reference's process zoo (beanstalkd tubes + crawl-job
listener + Scrapy spiders + 15 parser workers) with one iterative Spark
plan per micro-batch:

  schedule (politeness top-q + budget cap)
    → fetch (Arrow UDF over the synthetic web)
    → trace / docs / metrics out
    → retry re-queue (backoff in batches)
    → outlink admission (filters → canonicalize → dedup → seen anti-join
       → robots gate) → discovery_seq assignment → frontier insert
    → atomic checkpoint commit (storage.BatchStore)

Every batch commits per-partition lineage + metrics and the full frontier /
seen-delta state; a killed job resumes from the last committed manifest
(north rule resumability). The loop's outputs (ordering trace + final seen
set) are asserted equal to the pure-Python oracle in tests.
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import synth
from ..functions.urls import canonicalize_url, fingerprint_udf
from ..operators.admission import admit, dedup_in_batch, filter_unseen, gate_robots
from ..operators.fetch import fetch_scheduled
from ..operators.politeness import select_fetch_batch
from ..operators.sequence import with_sequence
from ..policy import PARSEABLE_CONTENT_TYPES, RETRYABLE_STATUSES, CrawlPolicy
from ..storage import BatchStore

_FRONTIER_COLS = [
    "crawl_id", "url", "url_norm", "url_hash", "url_fp", "host", "depth",
    "priority_score", "discovery_seq", "state", "attempts", "not_before_batch",
]

_RETRYABLE_LIST = sorted(RETRYABLE_STATUSES)
_PARSEABLE_LIST = sorted(PARSEABLE_CONTENT_TYPES)


@dataclass
class CrawlRunResult:
    store: BatchStore
    last_batch: int
    pages_crawled: dict

    def trace(self, spark: SparkSession) -> DataFrame:
        return self.store.read_appendonly(spark, self.last_batch, "trace")

    def seen(self, spark: SparkSession) -> DataFrame:
        return self.store.read_appendonly(spark, self.last_batch, "seen")

    def docs(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_appendonly(spark, self.last_batch, "docs")

    def blocked(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_appendonly(spark, self.last_batch, "blocked")

    def lineage(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_appendonly(spark, self.last_batch, "lineage")


def _crawl_dim(spark: SparkSession, seeds: list[dict]) -> DataFrame:
    rows = []
    for s in sorted(seeds, key=lambda s: s["crawl_id"]):
        dom = s["domain"]
        a1, a2 = (dom, dom[4:]) if dom.startswith("www.") else (dom, f"www.{dom}")
        rows.append((s["crawl_id"], dom, a1, a2, int(s["max_pages"])))
    return spark.createDataFrame(
        rows, "crawl_id string, domain string, allowed_host_1 string, "
        "allowed_host_2 string, max_pages int"
    )


def _finish_frontier_rows(admitted_ok: DataFrame) -> DataFrame:
    """Admitted candidates (with discovery_seq) → FRONTIER-schema rows."""
    return admitted_ok.select(
        "crawl_id",
        "url",
        "url_norm",
        F.xxhash64("url_norm").alias("url_hash"),
        fingerprint_udf("url_norm").alias("url_fp"),
        "host",
        F.col("depth").cast("int").alias("depth"),
        F.lit(0.0).alias("priority_score"),
        "discovery_seq",
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempts"),
        F.lit(0).cast("long").alias("not_before_batch"),
    )


def init_crawl(
    spark: SparkSession,
    seeds: list[dict],
    robots_rules: DataFrame,
    store: BatchStore,
) -> None:
    """Seed admission, committed as batch=-1 (reference: start_urls are
    enqueued unfiltered, domain_spider.py:219-265; robots gating still
    applies per north rule)."""
    ordered = sorted(seeds, key=lambda s: s["crawl_id"])
    rows = []
    for idx, s in enumerate(ordered):
        seed_url = s["url"] or f"https://{s['domain']}/"
        rows.append((s["crawl_id"], seed_url, canonicalize_url(seed_url), 0, idx, 0))
    cand = spark.createDataFrame(
        rows,
        "crawl_id string, url string, url_norm string, parent_seq long, "
        "link_idx int, depth int",
    ).withColumn("host", F.lower(F.regexp_extract("url_norm", r"^[a-z]+://([^/]*)", 1)))
    empty_seen = spark.createDataFrame([], "crawl_id string, url_norm string")
    deduped = dedup_in_batch(
        cand.withColumnRenamed("url", "raw_url")
        .withColumn("allowed_host_1", F.lit(None).cast("string"))
        .withColumn("allowed_host_2", F.lit(None).cast("string"))
    )
    unseen = filter_unseen(deduped, empty_seen)
    admitted = gate_robots(unseen, robots_rules).cache()

    queued = with_sequence(
        admitted.where("robots_ok").drop("robots_ok"),
        ["parent_seq", "link_idx"],
        start=0,
    )
    frontier = _finish_frontier_rows(queued)
    n_queued = frontier.count()

    seen_delta = admitted.select(
        "crawl_id",
        F.xxhash64("url_norm").alias("url_hash"),
        "url_norm",
        F.lit(-1).cast("long").alias("first_seen_batch"),
    )
    blocked = admitted.where(~F.col("robots_ok")).select(
        "crawl_id", "url_norm", F.lit(-1).cast("long").alias("batch_id")
    )

    store.write_table(frontier, -1, "frontier")
    store.write_table(seen_delta, -1, "seen")
    store.write_table(blocked, -1, "blocked")
    store.commit(
        -1,
        {
            "next_seq": int(n_queued),
            "pages": {s["crawl_id"]: 0 for s in ordered},
        },
    )


def run_crawl(
    spark: SparkSession,
    cfg: synth.SynthConfig,
    seeds: list[dict],
    robots_rules: DataFrame,
    checkpoint_dir: str,
    policy: CrawlPolicy = CrawlPolicy(),
    resume: bool = False,
    stop_after_batch: int | None = None,
) -> CrawlRunResult:
    """Run (or resume) the crawl to completion. ``stop_after_batch`` kills
    the loop after committing that batch — used by the resume tests."""
    store = BatchStore(checkpoint_dir)
    store.rollback_uncommitted()
    last = store.last_committed()
    if not resume or last is None:
        if last is not None:
            raise ValueError(f"checkpoint {checkpoint_dir} already has state; pass resume=True")
        init_crawl(spark, seeds, robots_rules, store)
        last = -1

    crawls = _crawl_dim(spark, seeds).cache()
    manifest = store.read_manifest(last)
    next_seq: int = manifest["next_seq"]
    pages: dict[str, int] = dict(manifest["pages"])
    max_pages = {r["crawl_id"]: r["max_pages"] for r in crawls.collect()}

    batch = last + 1
    while batch < policy.max_batches:
        frontier = store.read_table(spark, batch - 1, "frontier")
        active = {c for c in pages if pages[c] < max_pages[c]}
        budgets = spark.createDataFrame(
            [(c, max_pages[c] - pages[c]) for c in sorted(active)] or
            [("__none__", 0)],
            "crawl_id string, remaining int",
        ).where(F.col("remaining") > 0)

        avail = frontier.join(F.broadcast(budgets), "crawl_id")
        counts = avail.agg(
            F.sum(F.when(F.col("not_before_batch") <= batch, 1).otherwise(0)).alias("elig"),
            F.sum(F.when(F.col("not_before_batch") > batch, 1).otherwise(0)).alias("future"),
        ).collect()[0]
        n_elig, n_future = counts["elig"] or 0, counts["future"] or 0
        if n_elig == 0:
            if n_future > 0:
                # idle batch: nothing schedulable yet, commit an empty batch
                store.write_table(frontier, batch, "frontier")
                store.commit(batch, {"next_seq": next_seq, "pages": pages})
                batch += 1
                continue
            break

        eligible = avail.where(F.col("not_before_batch") <= batch).drop("remaining")
        scheduled = select_fetch_batch(eligible, budgets, policy)
        fetched = fetch_scheduled(scheduled, cfg).cache()

        # --- trace + docs + metrics
        trace = fetched.select(
            "crawl_id",
            F.lit(batch).cast("long").alias("batch_id"),
            F.col("seq_in_batch").cast("long"),
            "url_norm", "host", "depth",
        )
        is_page = (F.col("status") == 200) & F.col("content_type").isin(_PARSEABLE_LIST)
        docs = fetched.where(is_page).select(
            "crawl_id", "url_norm", F.xxhash64("url_norm").alias("url_hash"),
            "host", "depth", "status", "content_type", "doc_id", "spans",
            F.lit(batch).cast("long").alias("fetched_in_batch"),
        )
        metrics = fetched.groupBy("crawl_id", "host").agg(
            F.count("*").alias("requests"),
            F.sum(is_page.cast("long")).alias("successes"),
            F.sum((F.col("status") >= 400).cast("long")).alias("failures"),
            F.sum(F.when(is_page, F.size("spans")).otherwise(0)).cast("long").alias("bytes"),
        ).withColumn("batch_id", F.lit(batch).cast("long"))

        page_counts = {
            r["crawl_id"]: r["n"]
            for r in fetched.where(is_page).groupBy("crawl_id").agg(F.count("*").alias("n")).collect()
        }
        for cid, n in page_counts.items():
            pages[cid] = pages.get(cid, 0) + n
        active_after = sorted(c for c in pages if pages[c] < max_pages[c])

        # --- retries (Q7: backoff in batches, bury after max_attempts)
        retryable = F.col("status").isin(_RETRYABLE_LIST)
        retries = (
            fetched.where(retryable & (F.col("attempts") < policy.max_attempts))
            .withColumn("attempts", F.col("attempts") + 1)
            .withColumn(
                "not_before_batch",
                F.lit(batch)
                + F.least(F.pow(F.lit(2.0), F.col("attempts")), F.lit(float(policy.backoff_cap))).cast("long"),
            )
            .select(*_FRONTIER_COLS)
        )

        # --- outlink candidates from this batch's fetches
        parsed = fetched.where(is_page).select(
            "crawl_id",
            F.col("discovery_seq").alias("parent_seq"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("outlinks").alias("link_idx", "raw_url"),
        )
        redirected = fetched.where(
            (F.col("status") == 301) & (F.size("outlinks") > 0)
        ).select(
            "crawl_id",
            F.col("discovery_seq").alias("parent_seq"),
            F.col("depth"),
            F.lit(0).alias("link_idx"),
            F.col("outlinks").getItem(0).alias("raw_url"),
        )
        candidates = (
            parsed.unionByName(redirected)
            .where(F.col("crawl_id").isin(active_after))
            .join(
                F.broadcast(crawls.select("crawl_id", "allowed_host_1", "allowed_host_2")),
                "crawl_id",
            )
        )

        seen = store.read_appendonly(spark, batch - 1, "seen")
        admitted = admit(candidates, seen, robots_rules).cache()

        queued_new = with_sequence(
            admitted.where("robots_ok").drop("robots_ok"),
            ["parent_seq", "link_idx"],
            start=next_seq,
        )
        new_frontier_rows = _finish_frontier_rows(queued_new)

        seen_delta = admitted.select(
            "crawl_id",
            F.xxhash64("url_norm").alias("url_hash"),
            "url_norm",
            F.lit(batch).cast("long").alias("first_seen_batch"),
        )
        blocked = admitted.where(~F.col("robots_ok")).select(
            "crawl_id", "url_norm", F.lit(batch).cast("long").alias("batch_id")
        )

        frontier_next = (
            frontier.join(scheduled.select("discovery_seq"), "discovery_seq", "left_anti")
            .select(*_FRONTIER_COLS)
            .unionByName(retries)
            .unionByName(new_frontier_rows)
        )

        # --- per-partition lineage (north rule)
        lineage = (
            fetched.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("rows_fetched"),
                F.sum(is_page.cast("long")).alias("rows_ok"),
            )
            .select(
                F.lit(batch).cast("long").alias("batch_id"),
                "partition_id",
                F.lit(n_elig).cast("long").alias("rows_in"),
                F.col("rows_fetched").cast("long"),
                F.col("rows_ok").cast("long").alias("rows_deduped"),
                F.lit(None).cast("long").alias("rows_admitted"),
                F.lit(datetime.datetime.now(datetime.timezone.utc).isoformat()).alias("commit_ts"),
            )
        )

        # --- commit (manifest last = commit point)
        store.write_table(trace, batch, "trace")
        store.write_table(docs, batch, "docs")
        store.write_table(metrics, batch, "metrics")
        store.write_table(seen_delta, batch, "seen")
        store.write_table(blocked, batch, "blocked")
        store.write_table(frontier_next, batch, "frontier")
        store.write_table(lineage, batch, "lineage")

        n_admitted = spark.read.parquet(store.table_path(batch, "frontier")).where(
            F.col("discovery_seq") >= next_seq
        ).count()
        next_seq += n_admitted
        store.commit(batch, {"next_seq": next_seq, "pages": pages})

        fetched.unpersist()
        admitted.unpersist()
        spark.catalog.clearCache()
        crawls = _crawl_dim(spark, seeds).cache()

        if stop_after_batch is not None and batch >= stop_after_batch:
            return CrawlRunResult(store, batch, dict(pages))
        batch += 1

    return CrawlRunResult(store, batch - 1, dict(pages))
