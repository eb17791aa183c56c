"""Politeness scheduling: per-host quota with skew salting.

North-rule prescription: "per-host politeness buckets ... expressed as
salted groupBy.applyInPandas over host-keyed partitions". Reference
semantics: at most ``quota_per_host`` in-flight requests per domain
(CONCURRENT_REQUESTS_PER_DOMAIN=4, settings.py:46-48; the spider yields
next URLs only while len(currently_crawling) < quota,
domain_spider.py:538-548), here discretized to "at most q scheduled
fetches per (crawl, host) per micro-batch".

Two-phase exact top-q under salting (SURVEY.md §7 risk #3):

  phase 1: group by (crawl_id, host, salt) where salt = xxhash64(url_norm) % S
           → each salt group emits its local top-q (applyInPandas).
           The union of S local top-q sets provably contains the global
           top-q, while no single task ever sees a hot host's full frontier.
  phase 2: window over (crawl_id, host) → row_number ≤ q on the ≤ S·q
           survivors (tiny), giving the exact host-level top-q.

Order key everywhere: (depth ASC, priority_score DESC, discovery_seq ASC)
— total, data-defined, parallelism-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..policy import CrawlPolicy

_SORT_COLS = ["depth", "priority_score", "discovery_seq"]
_SORT_ASC = [True, False, True]


def _local_topq(quota: int):
    def take(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(_SORT_COLS, ascending=_SORT_ASC).head(quota)

    return take


def select_fetch_batch(
    eligible: DataFrame,
    budgets: DataFrame,
    policy: CrawlPolicy,
) -> DataFrame:
    """Pick this batch's fetch set from eligible frontier rows.

    ``budgets``: (crawl_id, remaining) — max_pages minus pages crawled so
    far; always small (one row per crawl), broadcast.

    Returns the scheduled rows with ``seq_in_batch`` (per-crawl trace
    order, 1-based).
    """
    salted = eligible.withColumn(
        "_salt", F.pmod(F.xxhash64("url_norm"), F.lit(policy.n_salts))
    )
    phase1 = (
        salted.groupBy("crawl_id", "host", "_salt")
        .applyInPandas(
            lambda _key, pdf: _local_topq(policy.quota_per_host)(pdf),
            schema=salted.schema,
        )
        .drop("_salt")
    )

    host_w = Window.partitionBy("crawl_id", "host").orderBy(
        F.col("depth").asc(), F.col("priority_score").desc(), F.col("discovery_seq").asc()
    )
    phase2 = (
        phase1.withColumn("_rn", F.row_number().over(host_w))
        .where(F.col("_rn") <= policy.quota_per_host)
        .drop("_rn")
    )

    crawl_w = Window.partitionBy("crawl_id").orderBy(
        F.col("depth").asc(), F.col("priority_score").desc(), F.col("discovery_seq").asc()
    )
    scheduled = (
        phase2.join(F.broadcast(budgets), "crawl_id")
        .withColumn("seq_in_batch", F.row_number().over(crawl_w))
        .where(F.col("seq_in_batch") <= F.col("remaining"))
        .drop("remaining")
    )
    return scheduled
