"""Fixed StructType schemas for every engine table.

The reference (raulGuru/crawler_distributed) is schemaless JSON/BSON with
ad-hoc validation (lib/queue/job_serializer.py:80-129). The engine is the
deliberate upgrade: one module of frozen StructTypes that tests assert on.

Schemas follow FIXTURES.md / BASELINE.json input_hint:
  docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- the authoritative interleaved-document payload (BASELINE.json input_hint)
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# span kinds (superset of reference page payload: HTML text + tracked media
# refs, crawler/spider_project/pipelines + parser/workers/links_worker.py:133-136)
SPAN_KINDS = ("text", "heading", "title", "link", "image", "video", "script", "meta")

# --- seed list (reference: MongoDB domains_crawl, scripts/domain_importer.py:229-300)
SEEDS = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("max_pages", T.IntegerType(), False),
        T.StructField("single_url", T.BooleanType(), False),
        T.StructField("use_sitemap", T.BooleanType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("project_id", T.StringType(), True),
    ]
)

# --- frontier (reference: per-spider deque + sets, domain_spider.py:110-115;
# here a table partition-bucketed by host hash)
FRONTIER = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url_norm)
        T.StructField("url_fp", T.StringType(), False),  # sha256 hex (reference parity)
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority_score", T.DoubleType(), False),
        T.StructField("discovery_seq", T.LongType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("not_before_batch", T.LongType(), False),
    ]
)

FRONTIER_STATES = ("queued", "fetching", "done", "failed", "robots_blocked", "skipped")

# --- url_seen (reference: enqueued ∪ currently_crawling ∪ crawled sets,
# domain_spider.py:112-115; equality asserted on url_norm)
URL_SEEN = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("first_seen_batch", T.LongType(), False),
    ]
)

# --- synthetic web: the deterministic fetch oracle (FIXTURES.md §3)
SYNTHETIC_WEB = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("outlinks", T.ArrayType(T.StringType()), False),
        T.StructField("robots_allowed", T.BooleanType(), False),
        T.StructField("latency_class", T.IntegerType(), False),
    ]
)

# --- fetched docs (reference item dict, domain_spider.py:556-571)
FETCHED_DOCS = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN), True),
        T.StructField("fetched_in_batch", T.LongType(), False),
    ]
)

# --- ordering trace (FIXTURES.md §5 — golden crawl-order output)
ORDERING_TRACE = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("seq_in_batch", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# --- per-partition lineage + metrics (north rule: every micro-batch
# checkpoints per-partition lineage + fetch/dedup metrics)
LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_fetched", T.LongType(), False),
        T.StructField("rows_deduped", T.LongType(), False),
        T.StructField("rows_admitted", T.LongType(), False),
        T.StructField("commit_ts", T.StringType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("crawl_id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("requests", T.LongType(), False),
        T.StructField("successes", T.LongType(), False),
        T.StructField("failures", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# --- robots rules table (north rule requires robots gating; reference only
# reads robots for sitemap discovery, ROBOTSTXT_OBEY=False settings.py:61)
ROBOTS_RULES = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)
