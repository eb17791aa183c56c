"""Per-host fetch strategy: UA rotation, escalation ladder, JS detection.

Reference semantics, made deterministic (SURVEY.md §4):
- P4 UA rotation: per-domain stable choice
  (middlewares/user_agent_middleware.py:158-197 picks randomly on first
  touch then pins) → here UA_POOL[pmod(xxhash64(host), len(pool))], which
  is per-host-stable by construction and removes the RNG.
- P5/P6 escalation ladder: direct → proxy → render as failure counts
  cross thresholds (middlewares/proxy_middleware.py:40-95,
  spiders/base_spider.py:151-244: proxy after 403/429, render after
  repeated failures) → a deterministic state machine over per-host
  failure aggregates, joined at fetch time as a dimension.
- P7 JS-heavy detection: script-density heuristics
  (middlewares/js_rendering_middleware.py:470-543: >5 scripts,
  script/html ratio > 0.5) re-expressed over span arrays; a host is
  marked js_required after 2 detections (:313-328 two-strike rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pool order matters: index = pmod(xxhash64(host), len) (settings.py:33-43
# pool, frozen here)
UA_POOL = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/120.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Edg/120.0",
)

PROXY_AFTER_FAILURES = 2   # consecutive-ish failures before proxy
RENDER_AFTER_FAILURES = 4  # ... before JS rendering
JS_SCRIPT_COUNT_THRESHOLD = 5
JS_SCRIPT_RATIO_THRESHOLD = 0.5
JS_REQUIRED_STRIKES = 2


def user_agent_col(host: Column) -> Column:
    """P4: deterministic per-host-stable UA assignment."""
    idx = F.pmod(F.xxhash64(host), F.lit(len(UA_POOL)))
    expr = F.lit(UA_POOL[0])
    for i, ua in enumerate(UA_POOL[1:], start=1):
        expr = F.when(idx == i, F.lit(ua)).otherwise(expr)
    return expr


def fetch_strategy_dim(metrics: DataFrame) -> DataFrame:
    """P5/P6: per-host strategy from cumulative failure counts.
    ``metrics``: (host, failures[, blocked_statuses]) aggregates.
    Output: (host, fetch_strategy ∈ {direct, proxy, render})."""
    per_host = metrics.groupBy("host").agg(F.sum("failures").alias("f"))
    strategy = (
        F.when(F.col("f") >= RENDER_AFTER_FAILURES, F.lit("render"))
        .when(F.col("f") >= PROXY_AFTER_FAILURES, F.lit("proxy"))
        .otherwise(F.lit("direct"))
    )
    return per_host.select("host", strategy.alias("fetch_strategy"))


# P5: ban window, in batches — the analog of PROXY_BLACKLIST_TIME=1800 s
# (crawler/spider_project/settings.py:69) at ~60 s per batch
PROXY_BLACKLIST_BATCHES = 30


def proxy_stats(events: DataFrame) -> DataFrame:
    """P5: per-proxy success/failure/banned tallies from proxied fetch
    events (proxy_id, status, batch_id) — proxy_manager.py:42-97 semantics:
    200 = success, 403/429 = banned (proxy burned for that site,
    proxy_middleware.py:74-78), other non-200 = failure. The newest ban
    opens a timed blacklist window (PROXY_BLACKLIST_TIME)."""
    is_success = F.col("status") == 200
    is_ban = F.col("status").isin(403, 429)
    return (
        events.groupBy("proxy_id")
        .agg(
            F.sum(is_success.cast("long")).alias("success"),
            F.sum((~is_success & ~is_ban).cast("long")).alias("failure"),
            F.sum(is_ban.cast("long")).alias("banned"),
            F.max(F.when(is_ban, F.col("batch_id"))).alias("last_ban_batch"),
        )
        .withColumn(
            "banned_until_batch",
            F.when(
                F.col("last_ban_batch").isNotNull(),
                F.col("last_ban_batch") + F.lit(PROXY_BLACKLIST_BATCHES),
            ),
        )
        .drop("last_ban_batch")
    )


def choose_proxy(stats: DataFrame, batch_id: int) -> DataFrame:
    """P5: the get_proxy() analog (proxy_manager.py:63-76): highest
    (success+1)/(failure+banned+1) among proxies whose ban window has
    expired (timed unban), deterministic tiebreak on proxy_id."""
    score = (F.col("success") + 1) / (F.col("failure") + F.col("banned") + 1)
    avail = stats.where(
        F.col("banned_until_batch").isNull()
        | (F.col("banned_until_batch") <= F.lit(batch_id))
    )
    return (
        avail.withColumn("score", F.round(score, 6))
        .orderBy(F.desc("score"), F.asc("proxy_id"))
        .limit(1)
        .select("proxy_id", "score")
    )


def needs_js_col(spans: Column) -> Column:
    """P7 per-doc classifier over spans: script-count / script-ratio
    heuristics (js_rendering_middleware.py:470-543 re-expressed)."""
    n_scripts = F.size(F.filter(spans, lambda s: s["kind"] == F.lit("script")))
    n_total = F.greatest(F.size(spans), F.lit(1))
    return (n_scripts > JS_SCRIPT_COUNT_THRESHOLD) | (
        (n_scripts / n_total) > JS_SCRIPT_RATIO_THRESHOLD
    )


def js_required_hosts(docs: DataFrame) -> DataFrame:
    """P7 two-strike aggregation: hosts with ≥2 js-flagged docs.
    ``docs``: (host, spans)."""
    flagged = docs.select("host", needs_js_col(F.col("spans")).alias("_js"))
    return (
        flagged.groupBy("host")
        .agg(F.sum(F.col("_js").cast("long")).alias("strikes"))
        .where(F.col("strikes") >= JS_REQUIRED_STRIKES)
        .select("host", F.lit(True).alias("js_required"))
    )
