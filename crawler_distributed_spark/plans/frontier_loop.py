"""The frontier iteration loop — batch-mode BFS crawl (SURVEY.md §3.1).

Replaces the reference's process zoo (beanstalkd tubes + crawl-job
listener + Scrapy spiders + 15 parser workers) with one iterative Spark
plan per micro-batch:

  schedule (politeness top-q + budget cap)
    → fetch (Arrow UDF over the synthetic web)
    → outlink admission (filters → canonicalize → dedup → seen anti-join
       → robots gate) → discovery_seq assignment → frontier insert
    → atomic checkpoint commit (storage.BatchStore)

Performance shape (local[32] now, 1000 executors later):
- Each heavy plan materializes EXACTLY ONCE per batch, as its durable
  parquet write (write-then-readback): `fetched` (materializes politeness
  + fetch), `admitted` (materializes the admission pipeline), and the
  frontier localCheckpoint (materializes the state union). Trace, docs,
  metrics, seen and blocked are read-time projections of the two written
  tables — no extra jobs, no extra copies.
- The URL-seen set is never re-materialized: the admission anti-join
  probes the lazy union of previously written `admitted` parquet dirs
  (append-only deltas; at 10^6+ batches these would be compacted, which
  is the Iceberg MERGE swap point in storage.py).
- Idle backoff gaps are jumped in one step (batch -> min not_before)
  rather than committed as empty batches; the oracle's batch numbering is
  preserved because nothing observable happens in the gap.
- Every batch appends per-partition lineage + metrics (north rule), and a
  killed job resumes exactly: deterministic replay from the last durable
  manifest reproduces bit-identical outputs (tests/test_trace_equality.py).
"""

from __future__ import annotations

import contextlib
import datetime
import os
import time
from dataclasses import dataclass

_TIMING = os.environ.get("SPARK_GRAFT_TIMING") == "1"


@contextlib.contextmanager
def _timed(label: str):
    if not _TIMING:
        yield
        return
    t0 = time.time()
    yield
    print(f"      [{label}] {time.time() - t0:.2f}s", flush=True)

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import synth
from ..functions.urls import canonicalize_url, host_col
from ..operators.admission import admit, dedup_in_batch, filter_unseen, gate_robots
from ..operators.fetch import fetch_scheduled
from ..operators.politeness import select_fetch_batch
from ..functions.sitemaps import sitemap_score_col
from ..operators.sequence import with_sequence
from ..policy import (
    ACCEPTED_CONTENT_TYPES,
    REDIRECT_STATUSES,
    RETRYABLE_STATUSES,
    CrawlPolicy,
)
from ..storage import BatchStore

_FRONTIER_COLS = [
    "crawl_id", "url", "url_norm", "url_hash", "url_fp", "host", "depth",
    "priority_score", "discovery_seq", "state", "attempts", "not_before_batch",
    "forced_strategy",
]

_RETRYABLE_LIST = sorted(RETRYABLE_STATUSES)
_REDIRECT_LIST = sorted(REDIRECT_STATUSES)
_ACCEPTED_LIST = sorted(ACCEPTED_CONTENT_TYPES)


def _is_page():
    """F6+F7: a page is a 200 response of an accepted content type
    (content_filter_middleware.py:43-51 allowlist) that is NOT a
    robots/sitemap control fetch. Non-html accepted types (xml/plain)
    count toward the budget and are stored, but carry no spans/outlinks
    in the synthetic web."""
    return (
        (F.col("status") == 200)
        & F.col("content_type").isin(_ACCEPTED_LIST)
        & (F.col("doc_class") == "content")
    )


@dataclass
class CrawlRunResult:
    store: BatchStore
    last_batch: int
    batch_seconds: list | None = None  # wall time of each executed batch
    _max_failed: int = 20              # policy.max_failed_pages at run time
    _default_cap: int = 1 << 30        # policy.max_batches_per_crawl (or inf)
    # order-insensitive output hashes ACCUMULATED batch-by-batch as
    # observe() metrics on the writes that run anyway (bit_xor is
    # associative/commutative, so the XOR of per-batch bit_xors equals
    # the full-table scan bit-for-bit — pinned by
    # tests/test_trace_equality.py). Set only on fresh, complete runs:
    # {"trace_rows", "trace_hash", "seen_rows", "seen_hash"}. A resumed
    # or stop_after_batch run leaves this None (partial accumulation
    # would be a lie) and callers fall back to the full scan.
    out_hashes: dict | None = None

    def budget(self, spark: SparkSession) -> DataFrame:
        """Per-crawl budget state (pages/failed/max_pages/max_batches) as
        a DataFrame — the run path returns tables, never O(#crawls)
        driver dicts (r3 #7; at the 10^7-crawl shape a collect here would
        serialize the run end)."""
        return self.store.read_table(spark, self.last_batch, "budget")

    def pages_dict(self, spark: SparkSession) -> dict:
        """{crawl_id: pages} driver-side convenience for tests and CLI
        summaries; the O(#crawls) collect happens only when a call site
        explicitly asks for it."""
        return {r["crawl_id"]: r["pages"] for r in self.budget(spark).collect()}

    def _fetched(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_appendonly(spark, self.last_batch, "fetched")

    def _admitted(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_appendonly(spark, self.last_batch, "admitted")

    def trace(self, spark: SparkSession) -> DataFrame:
        f = self._fetched(spark)
        return f.select(
            "crawl_id", "batch_id", "seq_in_batch", "url_norm", "host", "depth"
        )

    def seen(self, spark: SparkSession) -> DataFrame:
        a = self._admitted(spark)
        return a.select("crawl_id", "url_hash", "url_norm", "first_seen_batch")

    def docs(self, spark: SparkSession) -> DataFrame | None:
        f = self._fetched(spark)
        if f is None:
            return None
        return f.where(_is_page()).select(
            "crawl_id", "url_norm", "url_hash", "host", "depth", "status",
            "content_type", "doc_id", "spans", "response_headers",
            F.col("batch_id").alias("fetched_in_batch"),
        )

    def blocked(self, spark: SparkSession) -> DataFrame | None:
        a = self._admitted(spark)
        if a is None:
            return None
        return a.where(~F.col("robots_ok")).select(
            "crawl_id", "url_norm", F.col("first_seen_batch").alias("batch_id")
        )

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        f = self._fetched(spark)
        if f is None:
            return None
        return f.groupBy("crawl_id", "batch_id", "host").agg(
            F.count("*").alias("requests"),
            F.sum(_is_page().cast("long")).alias("successes"),
            F.sum((F.col("status") >= 400).cast("long")).alias("failures"),
            F.sum(F.when(_is_page(), F.size("spans")).otherwise(0)).cast("long").alias("bytes"),
        )

    def lineage(self, spark: SparkSession) -> DataFrame | None:
        """Per-partition lineage + metrics rows, journaled with the
        frontier deltas (one write job per batch — r3 #3)."""
        j = self.store.read_appendonly(spark, self.last_batch, "frontier_delta")
        if j is None:
            return None
        return j.where(F.col("_op") == "lineage").select(
            "batch_id", "partition_id", "rows_in", "rows_fetched",
            "rows_deduped", "rows_admitted", "commit_ts",
        )

    def frontier_left(self, spark: SparkSession) -> DataFrame:
        """Frontier rows remaining at exit (finished crawls purged) —
        oracle-diffed in tests/test_trace_equality.py. Delta replay
        records schedules/additions, not finished-crawl purges, so the
        purge is applied at read time exactly like the resume path."""
        f = self.store.read_frontier(spark, self.last_batch, _FRONTIER_COLS)
        b = self.store.read_table(spark, self.last_batch, "budget")
        active = b.where(
            (F.col("pages") < F.col("max_pages"))
            & (F.col("failed") < F.lit(self._max_failed))
            & (
                F.lit(self.last_batch + 1)
                < F.coalesce(F.col("max_batches"), F.lit(self._default_cap))
            )
        ).select("crawl_id")
        return f.join(F.broadcast(active), "crawl_id", "left_semi")

    def health(self, spark: SparkSession) -> DataFrame:
        """A4 queue-health view (workers/monitor_worker.py:60-120 checks
        ready/buried counts per tube and warns on backlog): per crawl —
        queued rows left, retry backlog (attempts>0, the 'buried jobs may
        need attention' analog), delayed rows (backoff not yet due),
        pages/failed vs budget, and a status verdict. Host CPU/mem/disk
        (:121-139 psutil) stay Spark-UI domain by design."""
        f = self.frontier_left(spark)
        per_crawl = f.groupBy("crawl_id").agg(
            F.count("*").alias("queued"),
            F.sum((F.col("attempts") > 0).cast("long")).alias("retry_backlog"),
            F.sum(
                (F.col("not_before_batch") > self.last_batch).cast("long")
            ).alias("delayed"),
        )
        budget = self.store.read_table(spark, self.last_batch, "budget")
        return budget.join(per_crawl, "crawl_id", "left").select(
            "crawl_id",
            "pages",
            "failed",
            "max_pages",
            F.coalesce(F.col("queued"), F.lit(0)).alias("queued"),
            F.coalesce(F.col("retry_backlog"), F.lit(0)).alias("retry_backlog"),
            F.coalesce(F.col("delayed"), F.lit(0)).alias("delayed"),
            F.when(F.col("pages") >= F.col("max_pages"), F.lit("completed"))
            .when(F.col("failed") >= F.lit(self._max_failed), F.lit("failed_out"))
            .when(F.coalesce(F.col("queued"), F.lit(0)) == 0, F.lit("exhausted"))
            .otherwise(F.lit("waiting"))
            .alias("status"),
        )


def _table_exists(store: BatchStore, batch_id: int, table: str) -> bool:
    import os

    return os.path.isdir(store.table_path(batch_id, table))


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
    """Admitted candidates (with discovery_seq) → FRONTIER-schema rows.

    url_fp is computed JVM-side as sha2(url_norm): for canonical URLs
    without path-;params the reference's fingerprint string
    (lib/utils/url_utils.py:186-190) IS the canonical URL, so this equals
    functions.urls.url_fingerprint(url_norm) on the crawl's URL space
    (property-tested) while keeping the hot loop free of Python."""
    return admitted_ok.select(
        "crawl_id",
        "url",
        "url_norm",
        F.col("url_hash"),
        F.sha2(F.col("url_norm"), 256).alias("url_fp"),
        "host",
        F.col("depth").cast("int").alias("depth"),
        F.col("priority_score"),
        "discovery_seq",
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempts"),
        F.lit(0).cast("long").alias("not_before_batch"),
        F.lit(0).alias("forced_strategy"),
    )


def _admitted_wide(admitted: DataFrame, batch_id: int) -> DataFrame:
    """Durable ``admitted`` rows: the seen-set delta + robots verdicts +
    everything with_sequence/frontier-insert need downstream."""
    return admitted.select(
        "crawl_id",
        F.xxhash64("url_norm").alias("url_hash"),
        "url_norm",
        F.lit(batch_id).cast("long").alias("first_seen_batch"),
        "robots_ok",
        "url",
        "host",
        "parent_seq",
        "link_idx",
        "depth",
        "priority_score",
    )


def init_crawl(
    spark: SparkSession,
    seeds: list[dict],
    robots_rules: DataFrame,
    store: BatchStore,
    seq_singlepart_threshold: int = 20_000,
) -> tuple[DataFrame, int]:
    """Seed admission, committed as batch=-1 (reference: start_urls are
    enqueued unfiltered, domain_spider.py:219-265; robots gating still
    applies per north rule). Returns (frontier_df, next_seq)."""
    ordered = sorted(seeds, key=lambda s: s["crawl_id"])
    rows = []
    for idx, s in enumerate(ordered):
        seed_url = s["url"] or f"https://{s['domain']}/"
        # the submission's Q2 numeric priority (e.g. an earlier epoch's
        # PageRank via pipelines/graph.submission_priorities) rides the
        # seed frontier row. Sign convention: submissions order ASCENDING
        # (queue style), the loop's order key DESCENDING on
        # priority_score — so the row carries the negation; the oracle
        # applies the same rule.
        pri = -float(s.get("priority") or 0.0)
        rows.append(
            (s["crawl_id"], seed_url, canonicalize_url(seed_url), 0, idx, 0, pri)
        )
    cand = spark.createDataFrame(
        rows,
        "crawl_id string, url string, url_norm string, parent_seq long, "
        "link_idx int, depth int, priority_score double",
    ).withColumn("host", host_col(F.col("url_norm")))
    empty_seen = spark.createDataFrame([], "crawl_id string, url_norm string")
    deduped = dedup_in_batch(
        cand.withColumnRenamed("url", "raw_url")
        .withColumn("allowed_host_1", F.lit(None).cast("string"))
        .withColumn("allowed_host_2", F.lit(None).cast("string"))
    )
    unseen = filter_unseen(deduped, empty_seen)
    admitted = gate_robots(unseen, robots_rules)

    seed_obs = Observation("seen-init")
    store.write_table(
        _admitted_wide(admitted, -1).observe(
            seed_obs,
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(crawl_id, url_norm))").alias("h"),
        ),
        -1,
        "admitted",
    )
    sm = seed_obs.get
    admitted_r = store.read_table(spark, -1, "admitted")

    robots_ok_rows = admitted_r.where("robots_ok")
    if len(seeds) <= seq_singlepart_threshold:
        # small seed set: one global window stamps seqs inside the
        # frontier-write job itself (same values as with_sequence — the
        # identical (parent_seq, link_idx) total order, 0-based) instead
        # of paying the range-sample + count + stamp jobs of the
        # two-phase path; the count rides the write as an Observation
        from pyspark.sql import Window as _WS

        queued = robots_ok_rows.withColumn(
            "discovery_seq",
            (
                F.row_number().over(_WS.orderBy("parent_seq", "link_idx")) - 1
            ).cast("long"),
        )
        fr_obs = Observation("frontier-init")
        store.write_table(
            _finish_frontier_rows(queued).observe(
                fr_obs, F.count(F.lit(1)).alias("n")
            ),
            -1,
            "frontier",
        )
        n_queued = int(fr_obs.get["n"] or 0)
    else:
        queued, n_queued = with_sequence(
            robots_ok_rows,
            ["parent_seq", "link_idx"],
            start=0,
        )
        store.write_table(_finish_frontier_rows(queued), -1, "frontier")
    frontier = store.read_table(spark, -1, "frontier")
    budget = spark.createDataFrame(
        [
            (s["crawl_id"], 0, 0, int(s["max_pages"]), s.get("max_batches"))
            for s in ordered
        ],
        "crawl_id string, pages int, failed int, max_pages int, max_batches int",
    )
    store.write_table(budget, -1, "budget")
    store.commit(-1, {"next_seq": int(n_queued)})
    return frontier, int(n_queued), (int(sm["n"] or 0), int(sm["h"] or 0))


def run_crawl(
    spark: SparkSession,
    cfg: synth.SynthConfig,
    seeds: list[dict],
    robots_rules: DataFrame,
    checkpoint_dir: str,
    policy: CrawlPolicy = CrawlPolicy(),
    resume: bool = False,
    stop_after_batch: int | None = None,
    fetcher=None,
) -> CrawlRunResult:
    """Run (or resume) the crawl to completion. ``stop_after_batch`` kills
    the loop right after committing that batch — used by the resume tests.

    ``fetcher(scheduled_df, n_rows_hint) -> DataFrame`` swaps the fetch
    transport (default: the deterministic synthetic web; pass
    ``operators.http_fetch.fetch_scheduled_http`` for real HTTP) — the
    loop's politeness/admission/seen/checkpoint machinery is
    transport-agnostic, it only needs the fetch output schema."""
    store = BatchStore(checkpoint_dir)
    store.rollback_uncommitted()
    last = store.last_committed()

    # Q6 per-crawl batch budget (CLOSESPIDER_TIMEOUT analog): a crawl is
    # active at batch b iff its page budget remains, its failure cap is
    # unreached, AND b is below its batch cap (per-seed "max_batches",
    # else policy.max_batches_per_crawl, else unbounded)
    _default_cap = (
        policy.max_batches_per_crawl
        if policy.max_batches_per_crawl is not None
        else (1 << 30)
    )

    def _active_pred(b: int):
        return (
            (F.col("pages") < F.col("max_pages"))
            & (F.col("failed") < F.lit(policy.max_failed_pages))
            & (F.lit(b) < F.coalesce(F.col("max_batches"), F.lit(_default_cap)))
        )

    # output-hash accumulators (see CrawlRunResult.out_hashes): valid only
    # for fresh runs — a resume cannot cheaply reconstruct the prior
    # batches' contributions without the full scan it exists to avoid
    acc: dict | None = None
    if not resume or last is None:
        if last is not None:
            raise ValueError(
                f"checkpoint {checkpoint_dir} already has state; pass resume=True"
            )
        with _timed("init_crawl"):
            frontier, next_seq, (seed_n, seed_h) = init_crawl(
                spark, seeds, robots_rules, store,
                seq_singlepart_threshold=policy.seq_singlepart_threshold,
            )
        acc = {
            "trace_rows": 0, "trace_hash": 0,
            "seen_rows": seed_n, "seen_hash": seed_h,
        }
        last = -1
    else:
        manifest = store.read_manifest(last)
        next_seq = manifest["next_seq"]
        frontier = store.read_frontier(spark, last, _FRONTIER_COLS)
        # delta replay records schedules/additions, not finished-crawl
        # purges; apply the purge once with the committed budget (budgets
        # are monotone — a finished crawl never un-finishes, so purging
        # at resume equals purging every batch)
        _active = (
            store.read_table(spark, last, "budget")
            .where(_active_pred(last + 1))
            .select("crawl_id")
        )
        frontier = frontier.join(F.broadcast(_active), "crawl_id", "left_semi")

    crawls = _crawl_dim(spark, seeds).cache()
    # per-crawl budget lives as a Spark state table, not a driver dict —
    # every O(#crawls) driver loop/collect would serialize the batch at
    # 10^5+ crawls (and 10^7 on a real cluster)
    budget_state = store.read_table(spark, last, "budget").localCheckpoint()
    # loop-invariant dimension: aggregate + cache the robots rules once
    from ..operators.admission import aggregate_robots_rules
    from ..operators.seen_filter import build_bloom_delta, merge_blooms

    robots_agg = aggregate_robots_rules(robots_rules).cache()
    robots_agg.count()

    # partitioned bloom filter over the seen set (north rule): rebuilt from
    # the admitted deltas on start/resume, OR-merged with each batch's delta
    # P2 autothrottle state: per-host EWMA of fetch latency_class
    host_lat = (
        store.read_table(spark, last, "hostlat")
        if policy.autothrottle and _table_exists(store, last, "hostlat")
        else (
            spark.createDataFrame([], "host string, ewma double, last_b long")
            if policy.autothrottle
            else None
        )
    )

    # P6 escalation state: per (crawl, host) count of all-fail batches;
    # strategy level = min(2, fail_batches) (direct -> proxy -> render,
    # base_spider.py:151-244 made batch-deterministic)
    strat_state = (
        store.read_table(spark, last, "strategy")
        if _table_exists(store, last, "strategy")
        else spark.createDataFrame([], "crawl_id string, host string, fail_batches int")
    ).localCheckpoint()

    bloom = None
    if policy.use_bloom:
        seen_all = store.read_seen(spark, last)
        bloom = build_bloom_delta(
            seen_all.select("url_norm"), n_buckets=policy.bloom_buckets
        ).localCheckpoint()

    def _maybe_ck(df: DataFrame, b: int) -> DataFrame:
        """LAZY localCheckpoint for the small state frames: the first
        consumer's job materializes it (no dedicated driver job), every
        later consumer in the batch reads the cached blocks, and lineage
        is truncated so chains never deepen across batches."""
        return df.localCheckpoint(eager=False)

    batch = last + 1
    last_committed = last
    batch_seconds: list = []
    # Background pool overlapping independent per-batch jobs with the
    # critical path (guide §2.6: actions are only sequential because the
    # driver calls them sequentially): the journal write plus the small
    # state-table checkpoints (budget/strategy/bloom). Under AQE a "lazy"
    # localCheckpoint materializes its shuffle stages eagerly, so each of
    # these otherwise blocks the driver ~1 s per batch back-to-back.
    # Every future is resolved (`_resolve`) strictly before its first
    # consumer, so ordering semantics are unchanged; the journal future
    # is additionally flushed ahead of every manifest commit, keeping the
    # commit protocol intact (a journal is always durable before the
    # manifest that covers it; anything newer than the last manifest is
    # rolled back on resume).
    from concurrent.futures import ThreadPoolExecutor

    _journal_pool = ThreadPoolExecutor(max_workers=4)
    _journal_state: dict = {"fut": None}
    _pend: dict = {}

    def _submit_ck(name: str, df: DataFrame) -> None:
        _pend[name] = _journal_pool.submit(df.localCheckpoint, False)

    def _resolve(name: str, current):
        fut = _pend.pop(name, None)
        return fut.result() if fut is not None else current

    def _flush_journal() -> None:
        fut = _journal_state.get("fut")
        if fut is not None:
            _journal_state["fut"] = None
            fut.result()
    # eligibility for the NEXT batch rides the frontier checkpoint as an
    # Observation (no dedicated count job); None -> bootstrap/jump recount
    pending: tuple | None = None
    while batch < policy.max_batches:
        _bt0 = time.time()
        # budgets carries max_pages too: the fetch stage needs it for the
        # sitemap-index early break (domain_spider.py:326-354), and budget
        # state already holds it — carrying it here saves a second
        # per-batch O(#crawls) broadcast build (the former crawls-dim join)
        budgets = budget_state.where(_active_pred(batch)).select(
            "crawl_id",
            (F.col("max_pages") - F.col("pages")).alias("remaining"),
            "max_pages",
        )

        avail = frontier.join(F.broadcast(budgets), "crawl_id")
        if pending is None:
            with _timed("counts"):
                counts = avail.agg(
                    F.sum((F.col("not_before_batch") <= batch).cast("long")).alias("elig"),
                    F.min(
                        F.when(F.col("not_before_batch") > batch, F.col("not_before_batch"))
                    ).alias("next_nb"),
                ).collect()[0]
            n_elig, next_nb = counts["elig"] or 0, counts["next_nb"]
        else:
            n_elig, next_nb = pending
        if n_elig == 0:
            if next_nb is not None:
                # jump the idle backoff gap in one step; nothing observable
                # happens in between, so batch numbering stays oracle-equal
                batch = int(next_nb)
                pending = None  # recount at the jump target
                continue
            break

        eligible = avail.where(F.col("not_before_batch") <= batch).drop(
            "remaining", "max_pages"
        )
        host_quotas = None
        if policy.autothrottle:
            host_quotas = host_lat.select(
                "host",
                F.greatest(
                    F.lit(1),
                    F.floor(F.lit(policy.quota_per_host) / (F.lit(1.0) + F.col("ewma"))).cast("int"),
                ).alias("quota_h"),
            )
        scheduled = select_fetch_batch(
            eligible, budgets, policy, n_eligible=n_elig, host_quotas=host_quotas,
            # domain scoping (F4) admits exactly 2 hosts per crawl
            # (_crawl_dim), so the per-crawl politeness window input is
            # structurally <= 2*quota rows — the window path stays exact
            # AND embedded at any frontier size
            hosts_per_crawl_bound=2,
        )
        # (max_pages rides the budgets broadcast — scheduled already has it)
        # P6: effective strategy = host escalation level ∨ per-URL 403
        # force-proxy carried on the frontier row (retry_middleware.py:33-55)
        # strat_state is O(#crawls × hosts-per-crawl) like the budgets dim
        # (already broadcast by design); an explicit broadcast stops the
        # planner from SMJ-ing the batch against a stats-less RDD scan
        strat_state = _resolve("strat", strat_state)
        scheduled = scheduled.join(
            F.broadcast(strat_state), ["crawl_id", "host"], "left"
        ).withColumn(
            "strategy_level",
            F.greatest(
                F.least(F.coalesce(F.col("fail_batches"), F.lit(0)), F.lit(2)),
                F.col("forced_strategy"),
            ),
        ).drop("fail_batches")

        # materialization #1: politeness + fetch, straight into parquet.
        # n_rows_hint caps the Arrow-stage partition count by the batch's
        # row count: fat waves keep full parallelism, thin tail waves stop
        # paying (shuffle.partitions − needed) empty python tasks per job —
        # a pure per-batch-floor cut (partitioning never affects values).
        with _timed("fetch+schedule write"):
            _fetch = fetcher or (
                lambda s, hint: fetch_scheduled(s, cfg, n_rows_hint=hint)
            )
            # the run's trace hash rides this write as an Observation —
            # XOR-accumulated per batch, it equals the end-of-run
            # full-trace bit_xor scan bit-for-bit (associativity), so
            # callers like scripts/scaling_run.py need no final
            # O(total-urls) aggregation job at all (VERDICT r4 #1)
            tr_obs = Observation(f"trace-{batch}")
            store.write_table(
                _fetch(scheduled, n_elig).withColumn(
                    "batch_id", F.lit(batch).cast("long")
                ).observe(
                    tr_obs,
                    F.count(F.lit(1)).alias("n"),
                    F.expr(
                        "bit_xor(xxhash64("
                        "crawl_id, batch_id, seq_in_batch, url_norm, depth))"
                    ).alias("h"),
                ),
                batch,
                "fetched",
            )
            if acc is not None:
                tm = tr_obs.get
                acc["trace_rows"] += int(tm["n"] or 0)
                acc["trace_hash"] ^= int(tm["h"] or 0)
        fetched = store.read_table(spark, batch, "fetched")

        # ONE aggregation pass over the fetched read for both budget
        # deltas (pages) and fail deltas (r3 #3: every separate
        # post-fetch agg is a per-batch fixed cost the thin tail pays)
        page_pred = (
            F.lit(True) if policy.count_scheduled_in_budget else _is_page()
        )
        deltas = fetched.groupBy("crawl_id").agg(
            F.sum(page_pred.cast("long")).alias("_n"),
            F.sum((F.col("status") >= 400).cast("long")).alias("_f"),
        )
        with _timed("budget update"):
            budget_state = (
                budget_state.join(deltas, "crawl_id", "left")
                .select(
                    "crawl_id",
                    (F.col("pages") + F.coalesce(F.col("_n"), F.lit(0)))
                    .cast("int")
                    .alias("pages"),
                    (F.col("failed") + F.coalesce(F.col("_f"), F.lit(0)))
                    .cast("int")
                    .alias("failed"),
                    "max_pages",
                    "max_batches",
                )
            )
            # checkpoint in the background; resolved before active_df below
            _submit_ck("budget", budget_state)
        # P6: hosts whose every fetch this batch failed escalate one level
        host_fail = fetched.groupBy("crawl_id", "host").agg(
            (F.max(F.when(F.col("status") < 400, 1).otherwise(0)) == 0).alias("_allfail")
        )
        strat_state = (
            strat_state.join(host_fail, ["crawl_id", "host"], "full")
            .select(
                "crawl_id",
                "host",
                (
                    F.coalesce(F.col("fail_batches"), F.lit(0))
                    + F.when(F.coalesce(F.col("_allfail"), F.lit(False)), 1).otherwise(0)
                )
                .cast("int")
                .alias("fail_batches"),
            )
        )
        # checkpoint in the background; resolved before next batch's
        # scheduled join (and before any durable write this batch)
        _submit_ck("strat", strat_state)

        # --- retries (Q7/P8: per-status multiplier + per-status retry cap,
        # backoff in batches, bury past the cap — retry_middleware.py:33-55)
        _plan_t0 = time.time()
        from ..policy import RETRY_POLICY

        retryable = F.col("status").isin(_RETRYABLE_LIST)
        mult = F.lit(1.0)
        max_r = F.lit(0)
        for st_code, (m, r) in RETRY_POLICY.items():
            mult = F.when(F.col("status") == st_code, F.lit(m)).otherwise(mult)
            max_r = F.when(
                F.col("status") == st_code, F.lit(min(r, policy.max_attempts))
            ).otherwise(max_r)
        retries = (
            fetched.where(retryable & (F.col("attempts") < max_r))
            .withColumn("attempts", F.col("attempts") + 1)
            .withColumn(
                "not_before_batch",
                F.lit(batch)
                + F.least(
                    F.ceil(mult * F.pow(F.lit(2.0), F.col("attempts"))),
                    F.lit(policy.backoff_cap).cast("long"),
                ),
            )
            # 403 retries force the proxy strategy (retry_middleware.py:33-55)
            .withColumn(
                "forced_strategy",
                F.when(F.col("status") == 403, F.lit(1)).otherwise(
                    F.col("forced_strategy")
                ),
            )
            .select(*_FRONTIER_COLS)
        )

        # --- outlink candidates from this batch's fetches
        parsed = fetched.where(_is_page()).select(
            "crawl_id",
            F.col("discovery_seq").alias("parent_seq"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("outlinks").alias("link_idx", "raw_url"),
        ).withColumn("priority_score", F.lit(0.0))
        redirected = fetched.where(
            F.col("status").isin(_REDIRECT_LIST) & (F.size("outlinks") > 0)
        ).select(
            "crawl_id",
            F.col("discovery_seq").alias("parent_seq"),
            F.col("depth"),
            F.lit(0).alias("link_idx"),
            F.col("outlinks").getItem(0).alias("raw_url"),
            F.lit(0.0).alias("priority_score"),
        )
        # S6/Q3/Q4: sitemap-discovered URLs — scored (frozen clock), ranked
        # by score, truncated to the crawl's max_pages (sitemap_utils.py:
        # 374-433), admitted with the score as priority_score
        from pyspark.sql import Window as _W

        sm = (
            fetched.where(F.size("sitemap_entries") > 0)
            .select(
                "crawl_id",
                F.col("discovery_seq").alias("parent_seq"),
                (F.col("depth") + 1).alias("depth"),
                # max_pages rides the fetched row (scheduled carries it from
                # the budgets broadcast) — no per-batch crawls-dim join here
                "max_pages",
                F.explode("sitemap_entries").alias("e"),
            )
            .withColumn(
                "priority_score",
                sitemap_score_col(
                    F.col("e.priority"), F.col("e.lastmod"), F.col("e.changefreq"),
                    F.lit(policy.sitemap_now_date).cast("date"),
                ),
            )
            .withColumn(
                "link_idx",
                F.row_number().over(
                    _W.partitionBy("crawl_id", "parent_seq").orderBy(
                        F.desc("priority_score"), F.asc("e.url")
                    )
                )
                - 1,
            )
            .where(F.col("link_idx") < F.col("max_pages"))
            .select(
                "crawl_id", "parent_seq", "depth", "link_idx",
                F.col("e.url").alias("raw_url"), "priority_score",
            )
        )
        # S5: robots.txt fetches surface the located sitemap URL as a
        # CONTROL link — admitted with the F1-F5 content filters bypassed
        # (the reference fetches the located sitemap directly,
        # sitemap_utils.py:65-121, never through LinkExtractor)
        ctrl = (
            fetched.where(F.size("discovered") > 0)
            .select(
                "crawl_id",
                F.col("discovery_seq").alias("parent_seq"),
                (F.col("depth") + 1).alias("depth"),
                F.posexplode("discovered").alias("link_idx", "raw_url"),
            )
            .withColumn("priority_score", F.lit(0.0))
        )
        # active-crawl restriction + F4 scoping dim, as ONE broadcast: the
        # allowed-hosts dim semi-filtered by the active budget set (an
        # isin() literal list would break the plan at 10^4+ crawls; two
        # separate broadcasts were two O(#crawls) per-batch build jobs —
        # the inner join against the pre-filtered dim is equivalent)
        budget_state = _resolve("budget", budget_state)
        active_df = budget_state.where(_active_pred(batch)).select("crawl_id")
        cand_dim = crawls.select(
            "crawl_id", "allowed_host_1", "allowed_host_2"
        ).join(active_df, "crawl_id", "left_semi")
        candidates = (
            parsed.unionByName(redirected).unionByName(sm)
            .withColumn("is_control", F.lit(False))
            .unionByName(ctrl.withColumn("is_control", F.lit(True)))
            .join(F.broadcast(cand_dim), "crawl_id")
        )

        if _TIMING:
            print(f"      [candidates build] {time.time() - _plan_t0:.2f}s",
                  flush=True)
        # the seen set, split for the anti-join (storage.read_seen_parts):
        # the bucketed compacted copy scans with NO exchange on its side,
        # deltas ride as a small second anti-join; the periodic compaction
        # keeps this read O(compact_every) files, not O(#batches)
        seen = store.read_seen_parts(spark, batch - 1)

        # materialization #2: the admission pipeline, straight into parquet.
        # The bloom split is a pure optimization (novel rows bypass the
        # exact join; output is identical with or without it) — below
        # bloom_split_min eligible rows its two cogroup exchanges cost more
        # than the anti-join they shave, so thin batches skip it. The
        # admitted row count rides the write as an Observation (no extra
        # job) and gates the bloom delta build below.
        bloom = _resolve("bloom", bloom)
        use_split = bloom is not None and n_elig >= policy.bloom_split_min
        admitted = admit(
            candidates,
            seen,
            robots_agg,
            bloom=bloom if use_split else None,
            n_rows_hint=n_elig * max(1, cfg.branching),
        )
        adm_obs = Observation(f"adm-{batch}")
        with _timed("admission write"):
            store.write_table(
                _admitted_wide(admitted, batch).observe(
                    adm_obs,
                    F.count(F.lit(1)).alias("n"),
                    # seen-set hash contribution (see tr_obs above)
                    F.expr("bit_xor(xxhash64(crawl_id, url_norm))").alias("h"),
                ),
                batch,
                "admitted",
            )
        am = adm_obs.get
        n_admitted_rows = int(am["n"] or 0)
        if acc is not None:
            acc["seen_rows"] += n_admitted_rows
            acc["seen_hash"] ^= int(am["h"] or 0)
        admitted_r = store.read_table(spark, batch, "admitted")

        robots_ok_rows = admitted_r.where("robots_ok")
        if n_elig <= policy.seq_singlepart_threshold:
            # small batch: one global window stamps consecutive seqs (a
            # single sort of bounded size, embedded in the frontier job —
            # no range-sample / materialize / count jobs); the admitted
            # count is recovered from the frontier Observation below
            # (rows with seq >= next_seq are exactly this batch's)
            from pyspark.sql import Window as _WS

            queued_new = robots_ok_rows.withColumn(
                "discovery_seq",
                (
                    F.row_number().over(_WS.orderBy("parent_seq", "link_idx"))
                    + F.lit(next_seq - 1)
                ).cast("long"),
            )
            n_admitted = None
        else:
            with _timed("with_sequence count"):
                queued_new, n_admitted = with_sequence(
                    robots_ok_rows, ["parent_seq", "link_idx"], start=next_seq
                )

        # materialization #3: next frontier state (kept hot for the next
        # iteration; parquet-persisted on durable batches). The rebuild
        # also PURGES finished crawls' rows (pages/failed budgets never
        # un-finish, so those rows can never be scheduled again) and
        # carries the NEXT batch's eligibility aggregates as an
        # Observation — the per-batch count job folds into this one.
        next_active = budget_state.where(_active_pred(batch + 1)).select("crawl_id")
        elig_obs = Observation(f"elig-{batch}")
        with _timed("frontier checkpoint"):
            frontier = (
                # scheduled seqs come from the MATERIALIZED fetched table
                # (1:1 with the scheduled rows) — re-deriving them from
                # the lazy `scheduled` plan would recompute the whole
                # politeness stage inside this job
                frontier.join(fetched.select("discovery_seq"), "discovery_seq", "left_anti")
                .select(*_FRONTIER_COLS)
                .unionByName(retries)
                .unionByName(_finish_frontier_rows(queued_new))
                .join(F.broadcast(next_active), "crawl_id", "left_semi")
                .observe(
                    elig_obs,
                    F.sum(
                        (F.col("not_before_batch") <= batch + 1).cast("long")
                    ).alias("elig"),
                    F.min(
                        F.when(
                            F.col("not_before_batch") > batch + 1,
                            F.col("not_before_batch"),
                        )
                    ).alias("next_nb"),
                    # this batch's admissions: old rows and retries all carry
                    # seq < next_seq; the purge cannot drop new rows because
                    # admission already ran behind the identical active set
                    F.sum(
                        (F.col("discovery_seq") >= F.lit(next_seq)).cast("long")
                    ).alias("n_new"),
                )
            ).localCheckpoint()
        em = elig_obs.get
        pending = (int(em["elig"] or 0), em["next_nb"])
        if n_admitted is None:
            n_admitted = int(em["n_new"] or 0)
        seq_floor = next_seq  # this batch's new admissions carry seq >= this
        next_seq += n_admitted

        # durable per-batch JOURNAL — O(batch), ONE write job (r3 #3: the
        # separate frontier_delta + lineage writes were two of the ~4
        # fixed per-batch jobs dragging the thin-wave tail). Rows:
        #   'rm'      — the scheduled seqs leave (from the materialized
        #               fetched table)
        #   'add'     — retries + new admissions enter
        #   'lineage' — per-partition lineage + metrics (north rule),
        #               null frontier columns
        # Full O(frontier) snapshots happen only every
        # frontier_snapshot_every batches; storage.read_frontier replays
        # the 'rm'/'add' rows over the newest snapshot (the Iceberg MERGE
        # equivalent — at a 10^10-row frontier the per-batch durable cost
        # must not be O(frontier)) and ignores 'lineage' rows.
        with _timed("journal build"):
            _ftypes = {f.name: f.dataType for f in frontier.schema.fields}
            # `add` rows = retries + this batch's new admissions, read back
            # from the just-checkpointed frontier's CACHED blocks instead of
            # re-running the stamp/window plan (pre-r4 this job re-executed
            # the whole with_sequence + sha2 pipeline a second time — pure
            # duplicated per-row work). Retries are exactly the frontier
            # rows whose seq was scheduled this batch; new rows carry
            # seq >= seq_floor. Rows of crawls purged by next_active are
            # absent here, which is read-equivalent: budgets are monotone,
            # so every journal consumer (read_frontier replay at resume,
            # frontier_left) re-applies the same purge at read time.
            add_rows = (
                frontier.join(
                    fetched.select("discovery_seq").withColumn(
                        "_sch", F.lit(True)
                    ),
                    "discovery_seq",
                    "left",
                )
                .where(
                    (F.col("discovery_seq") >= F.lit(seq_floor))
                    | F.col("_sch").isNotNull()
                )
                .drop("_sch")
                .select(*_FRONTIER_COLS)
                .withColumn("_op", F.lit("add"))
            )
            rm_rows = fetched.select(
                *[
                    F.col(c)
                    if c == "discovery_seq"
                    else F.lit(None).cast(_ftypes[c]).alias(c)
                    for c in _FRONTIER_COLS
                ]
            ).withColumn("_op", F.lit("rm"))
            lineage = (
                fetched.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count("*").alias("rows_fetched"),
                    F.sum(_is_page().cast("long")).alias("rows_ok"),
                )
                .select(
                    F.lit(batch).cast("long").alias("batch_id"),
                    F.col("partition_id"),
                    F.lit(n_elig).cast("long").alias("rows_in"),
                    F.col("rows_fetched").cast("long"),
                    F.col("rows_ok").cast("long").alias("rows_deduped"),
                    F.lit(n_admitted).cast("long").alias("rows_admitted"),
                    F.lit(
                        datetime.datetime.now(datetime.timezone.utc).isoformat()
                    ).alias("commit_ts"),
                    F.lit("lineage").alias("_op"),
                )
            )
            journal_df = (
                rm_rows.unionByName(add_rows)
                .withColumn("_b", F.lit(batch).cast("long"))
                .unionByName(lineage, allowMissingColumns=True)
            )
        # OVERLAP the journal write with the rest of the batch (guide
        # §2.6: actions are only sequential because the driver calls them
        # sequentially). The journal reads this batch's CACHED frontier
        # blocks + the materialized fetched parquet — nothing the
        # remaining per-batch work (autothrottle/bloom/state writes, the
        # next batch's fetch) mutates — and durability only requires it
        # on disk BEFORE the next manifest commit (the commit point): a
        # torn journal above the last manifest is rolled back on resume
        # exactly like any other uncommitted write. `_flush_journal()`
        # joins the in-flight write at every commit/return point below.
        _flush_journal()
        _journal_state["fut"] = _journal_pool.submit(
            store.write_table, journal_df, batch, "frontier_delta"
        )

        if policy.autothrottle:
            # EWMA update from this batch's observed latencies (all
            # scheduled fetches of the host)
            obs = fetched.groupBy("host").agg(F.avg("latency_class").alias("_m"))
            host_lat = (
                host_lat.join(obs, "host", "full")
                .select(
                    "host",
                    F.when(
                        F.col("ewma").isNotNull() & F.col("_m").isNotNull(),
                        F.lit(policy.ewma_alpha) * F.col("_m")
                        + F.lit(1.0 - policy.ewma_alpha) * F.col("ewma"),
                    )
                    .when(F.col("_m").isNotNull(), F.col("_m"))
                    .otherwise(F.col("ewma"))
                    .alias("ewma"),
                    F.when(F.col("_m").isNotNull(), F.lit(batch).cast("long"))
                    .otherwise(F.col("last_b"))
                    .alias("last_b"),
                )
            )
            if policy.autothrottle_ttl_batches:
                # TTL eviction (r3 #8): hosts idle > ttl batches leave the
                # state table — host_lat is bounded by the active-host set
                # of the trailing window, not the 10^8-host crawl lifetime.
                # The EWMA re-seeds from the first batch mean on return
                # (the `_m is not null & ewma is null` branch above);
                # oracle.py applies the identical rule at the same point.
                host_lat = host_lat.where(
                    F.lit(batch) - F.col("last_b")
                    <= F.lit(policy.autothrottle_ttl_batches)
                )
            host_lat = _maybe_ck(host_lat, batch)

        if policy.use_bloom and n_admitted_rows:
            # a batch that admitted nothing (common in the thin tail)
            # contributes no new seen rows — the delta build + OR-merge
            # cogroup would be two no-op python stages; skip them outright
            with _timed("bloom merge"):
                delta = build_bloom_delta(
                    admitted_r.select("url_norm"), n_buckets=policy.bloom_buckets
                )
                bloom = merge_blooms(bloom, delta)
                # checkpoint in the background; resolved before the next
                # batch's admission consumes the bloom
                _submit_ck("bloom", bloom)

        durable = (
            policy.checkpoint_every <= 1
            or batch % policy.checkpoint_every == 0
            or (stop_after_batch is not None and batch >= stop_after_batch)
        )
        if durable:
            budget_state = _resolve("budget", budget_state)
            strat_state = _resolve("strat", strat_state)
            if batch % policy.frontier_snapshot_every == 0:
                store.write_table(frontier, batch, "frontier")
            store.write_table(budget_state, batch, "budget")
            store.write_table(strat_state, batch, "strategy")
            if policy.autothrottle:
                store.write_table(host_lat, batch, "hostlat")
            _flush_journal()  # the journal must precede its manifest
            store.commit(batch, {"next_seq": next_seq})
            last_committed = batch
            if policy.compact_seen_every and batch % policy.compact_seen_every == 0:
                with _timed("seen compaction"):
                    store.compact_seen(
                        spark, batch,
                        n_buckets=int(spark.conf.get("spark.sql.shuffle.partitions")),
                    )

        batch_seconds.append(round(time.time() - _bt0, 2))
        if stop_after_batch is not None and batch >= stop_after_batch:
            _journal_pool.shutdown(wait=True)
            return CrawlRunResult(
                store, batch, batch_seconds,
                policy.max_failed_pages, _default_cap,
            )
        batch += 1

    # final commit so the terminal state is always durable
    final = batch - 1
    if final > last_committed:
        with _timed("final commit"):
            budget_state = _resolve("budget", budget_state)
            strat_state = _resolve("strat", strat_state)
            store.write_table(frontier, final, "frontier")
            store.write_table(budget_state, final, "budget")
            store.write_table(strat_state, final, "strategy")
            _flush_journal()
            store.commit(final, {"next_seq": next_seq})
    _journal_pool.shutdown(wait=True)
    return CrawlRunResult(
        store, final, batch_seconds,
        policy.max_failed_pages, _default_cap,
        out_hashes=acc,
    )
