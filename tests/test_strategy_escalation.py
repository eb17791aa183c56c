"""P6 strategy escalation + 403 force-proxy + MAX_FAILED_PAGES (Q6).

Host 4 (seed 42) is a blocked host: every page/homepage 403s at the
direct strategy and succeeds from proxy up (synth.host_blocked). A crawl
of it must escalate — via the per-URL 403 force-proxy retry
(retry_middleware.py:33-55) and the per-host all-fail-batch escalation
(base_spider.py:151-244) — and then trace-match the pure-Python oracle.
"""

import pytest
from pyspark.sql import functions as F

from crawler_distributed_spark import synth
from crawler_distributed_spark.oracle import run_oracle
from crawler_distributed_spark.plans.frontier_loop import run_crawl
from crawler_distributed_spark.policy import CrawlPolicy

CFG = synth.SynthConfig(n_hosts=5, pages_base=10, hot_factor=2, branching=4)
SEEDS = synth.seed_rows(CFG, max_pages=6)
POLICY = CrawlPolicy()

BLOCKED_HOST = synth.host_name(4)


def test_blocked_host_exists():
    assert synth.host_blocked(CFG, 4)
    assert synth.status_of(CFG, f"https://{BLOCKED_HOST}/", 0) == 403
    assert synth.status_of(CFG, f"https://{BLOCKED_HOST}/", 1) == 200


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    oracle = run_oracle(CFG, SEEDS, POLICY)
    robots = spark.createDataFrame(synth.robots_rule_rows(CFG))
    d = str(tmp_path_factory.mktemp("strat_ckpt"))
    engine = run_crawl(spark, CFG, SEEDS, robots, d, POLICY)
    return oracle, engine


def test_escalation_trace_equality(spark, results):
    oracle, engine = results
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark).collect()
    )
    assert etrace == sorted(oracle.trace)


def test_blocked_host_crawled_via_escalation(spark, results):
    """The blocked host's crawl succeeds only AFTER escalation: the
    homepage is fetched twice (403 direct, then 200 forced-proxy) and
    pages are eventually crawled."""
    oracle, engine = results
    f = engine._fetched(spark)
    home = (
        f.where(F.col("url_norm") == f"https://{BLOCKED_HOST}/")
        .select("batch_id", "status", "strategy_level")
        .orderBy("batch_id")
        .collect()
    )
    assert [r.status for r in home] == [403, 200]
    assert [r.strategy_level for r in home] == [0, 1]
    assert oracle.pages_crawled["crawl-004"] > 0


def test_max_failed_pages_stops_crawl(spark, tmp_path_factory):
    """With a tiny failed-page budget the blocked-host crawl is cut off
    before it can escalate — and the engine still trace-matches."""
    policy = CrawlPolicy(max_failed_pages=1)
    oracle = run_oracle(CFG, SEEDS, policy)
    spark_sess = spark
    robots = spark_sess.createDataFrame(synth.robots_rule_rows(CFG))
    d = str(tmp_path_factory.mktemp("maxfail_ckpt"))
    engine = run_crawl(spark_sess, CFG, SEEDS, robots, d, policy)
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark_sess).collect()
    )
    assert etrace == sorted(oracle.trace)
    # the blocked crawl burned its failure budget on the first 403 and
    # never crawled a page
    assert oracle.failed_pages["crawl-004"] >= 1
    assert oracle.pages_crawled["crawl-004"] == 0
    # healthy crawls were unaffected relative to their own budget
    assert any(v > 0 for v in oracle.pages_crawled.values())
