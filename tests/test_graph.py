"""Link-graph PageRank: recurrence equality vs a pure-Python oracle,
isolated-node semantics, priority composition, and plan shape."""

import pytest
from pyspark.sql import functions as F

from crawler_distributed_spark.pipelines import graph


def _py_pagerank(n_nodes, edges, n_iters=3, damping=0.85):
    """Independent pure-Python implementation of the module's documented
    recurrence (N-scaled, dangling mass not redistributed)."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 for v in range(n_nodes)}
    for _ in range(n_iters):
        contrib = {v: 0.0 for v in range(n_nodes)}
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        pr = {v: (1 - damping) + damping * contrib[v] for v in range(n_nodes)}
    return pr


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )


def test_pagerank_matches_python_oracle_on_synthetic_graph(spark, docs):
    edges_df = graph.synthetic_link_edges(docs)
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    assert edges, "synthetic graph should be non-empty"
    expected = _py_pagerank(40, edges)
    got = {
        r.id: r.pr
        for r in graph.pagerank(
            docs.select(F.col("doc_id").alias("id")), edges_df, n_iters=3
        ).collect()
    }
    assert set(got) == set(range(40))
    for v in range(40):
        assert got[v] == pytest.approx(expected[v], abs=1e-9)


def test_isolated_nodes_keep_floor_rank(spark):
    # node 9 has no in-edges and no out-edges; it must survive with the
    # (1 - damping) floor, not disappear from the output.
    nodes = spark.range(10).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 9) for i in range(9)], "src long, dst long"
    )
    got = {r.id: r.pr for r in graph.pagerank(nodes, edges, n_iters=2).collect()}
    assert len(got) == 10
    assert got[9] == pytest.approx(0.15, abs=1e-12)


def test_hub_outranks_spokes(spark):
    # star: every spoke points at node 0 -> node 0 must rank highest.
    nodes = spark.range(6).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    ranks = graph.pagerank(nodes, edges, n_iters=3).collect()
    top = max(ranks, key=lambda r: r.pr)
    assert top.id == 0
    # closed form after >=2 iterations: spokes settle at the 0.15 floor
    # (no in-edges), hub at 0.15 + 0.85 * 5 * 0.15 (its mass drains --
    # no out-edge and dangling mass is not redistributed, by contract)
    assert top.pr == pytest.approx(0.15 + 0.85 * 5 * 0.15, abs=1e-12)
    for r in ranks:
        if r.id != 0:
            assert r.pr == pytest.approx(0.15, abs=1e-12)


def test_pagerank_priority_composition(spark, docs):
    edges_df = graph.synthetic_link_edges(docs)
    ranks = graph.pagerank(docs.select(F.col("doc_id").alias("id")), edges_df)
    frontier = spark.createDataFrame(
        [(0, "a"), (7, "b"), (999, "unranked")], "doc_id long, url string"
    )
    got = {r.doc_id: r.priority for r in graph.pagerank_priority(frontier, ranks).collect()}
    assert set(got) == {0, 7, 999}
    assert got[999] == pytest.approx(0.15)  # floor keeps ordering total
    assert got[0] != got[999] or got[7] != got[999]


def test_host_pagerank_from_crawl_output(spark):
    """The crawl's own fetched table feeds the host-level link graph:
    every page on spoke hosts links to the hub host, so the hub must
    out-rank the spokes (the authority signal a scheduler feeds back
    into frontier priority)."""
    rows = [
        (f"https://spoke{s}.example/p/{i}", ["https://hub.example/"])
        for s in range(3)
        for i in range(2)
    ] + [("https://hub.example/", ["https://spoke0.example/p/0"])]
    fetched = spark.createDataFrame(rows, "url_norm string, outlinks array<string>")
    edges = graph.host_edges_from_fetched(fetched)
    got = {(r.src, r.dst) for r in edges.collect()}
    assert ("spoke0.example", "hub.example") in got
    assert all(s != d for s, d in got)
    ranks = {
        r.id: r.pr for r in graph.pagerank(graph.nodes_of(edges), edges).collect()
    }
    assert max(ranks, key=ranks.get) == "hub.example"
    assert ranks["hub.example"] > ranks["spoke1.example"]


def test_pagerank_plan_has_no_cartesian(spark, docs):
    # materialized edge list: the iterative operator's own plan must be
    # pure equi-joins + aggregations (no cartesian/BNLJ anywhere).
    edges_df = spark.createDataFrame(
        [(r.src, r.dst) for r in graph.synthetic_link_edges(docs).collect()],
        "src long, dst long",
    )
    plan = graph.pagerank(
        docs.select(F.col("doc_id").alias("id")), edges_df, n_iters=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # end-to-end (edge derivation included): the weighted edge list is
    # lineage-truncated once, so the per-iteration joins must NOT replay
    # the derivation (no nested-loop joins in the final plan at all --
    # the corpus-count scalar broadcast lives inside the one-time
    # checkpointed subtree).
    full = graph.pagerank(
        docs.select(F.col("doc_id").alias("id")),
        graph.synthetic_link_edges(docs),
        n_iters=3,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full


def test_two_epoch_pagerank_feedback_loop(spark, tmp_path):
    """VERDICT r4 #8, end-to-end authority feedback: epoch-1 crawl →
    host PageRank over its own fetched table → epoch-2 submission
    priorities (graph.submission_priorities) → S3 backpressure admits
    the highest-authority domains first → the epoch-2 crawl's trace and
    seen set equal the pure-Python oracle given the SAME rank table."""
    from crawler_distributed_spark import synth
    from crawler_distributed_spark.oracle import run_oracle
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy
    from crawler_distributed_spark.sources.seeds import take_pending_seeds

    cfg = synth.SynthConfig(n_hosts=4, pages_base=6, hot_factor=2, branching=4)
    pol = CrawlPolicy()
    seeds1 = synth.seed_rows(cfg, max_pages=4)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))

    # --- epoch 1: crawl, then rank hosts from the crawl's own output
    res1 = run_crawl(spark, cfg, seeds1, robots, str(tmp_path / "e1"), pol)
    edges = graph.host_edges_from_fetched(res1._fetched(spark))
    ranks = graph.pagerank(graph.nodes_of(edges), edges, n_iters=3)

    # --- epoch 2: rank-prioritized submissions through S3 backpressure
    seeds2 = synth.seed_rows(cfg, max_pages=4)
    pending = spark.createDataFrame(
        seeds2,
        "crawl_id string, domain string, url string, max_pages int, "
        "single_url boolean, use_sitemap boolean, priority int, "
        "project_id string",
    )
    prioritized = graph.submission_priorities(pending, ranks)
    admitted_rows = take_pending_seeds(prioritized, capacity=2).collect()
    admitted = [r.asDict() for r in admitted_rows]
    assert len(admitted) == 2
    # the admission order IS the rank order (ascending priority = -pr)
    rank_map = {r.id: r.pr for r in ranks.collect()}
    by_rank = sorted(
        seeds2, key=lambda s: (-rank_map.get(s["domain"], 0.15), s["crawl_id"])
    )
    assert [a["crawl_id"] for a in admitted] == [
        s["crawl_id"] for s in by_rank[:2]
    ]
    # the nonzero priorities flow through BOTH implementations: engine
    # trace/seen == oracle trace/seen given the same rank table
    res2 = run_crawl(spark, cfg, admitted, robots, str(tmp_path / "e2"), pol)
    orc = run_oracle(cfg, admitted, pol)
    got_trace = [
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in res2.trace(spark)
        .orderBy("batch_id", "crawl_id", "seq_in_batch")
        .collect()
    ]
    want_trace = sorted(orc.trace, key=lambda t: (t[1], t[0], t[2]))
    assert got_trace == [tuple(t) for t in want_trace]
    got_seen = {
        (r.crawl_id, r.url_norm) for r in res2.seen(spark).collect()
    }
    want_seen = {
        (cid, u) for cid, urls in orc.seen.items() for u in urls
    }
    assert got_seen == want_seen
    # and the seed rows carried the negated submission priority
    pri = {a["crawl_id"]: a["priority"] for a in admitted}
    assert all(p < 0 for p in pri.values())
