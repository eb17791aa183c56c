"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over the
driver-provided tables; each has a DuckDB-equivalent ``oracle_sql()`` entry
unless genuinely non-SQL-expressible (those get the weaker rows-only
check). Column names/aliases match between Spark and SQL exactly; float
aggregates are rounded identically on both sides.

Operator coverage map (name → SURVEY §2 item):
  pricing_summary        A1 per-domain fetch stats (multi-agg groupBy)
  status_histogram       A3 queue-depth stats (groupBy count)
  top_hosts              A1 top-5 domains (join + agg + orderBy + limit)
  active_dedup_antijoin  C5 cross-submission dedup (left anti join)
  frontier_topk_per_host Q1/P1 per-host scheduling window (row_number ≤ k)
  politeness_quota       P1 per-host quota accounting
  priority_schedule      Q2/Q3 priority mapping + deterministic order + limit
  sitemap_score          Q3 sitemap URL scoring (frozen clock)
  url_admission          F1–F5 admission filters on synthesized URLs
  url_normalize_hosts    C1/F4 host extraction + scope grouping
  seen_antijoin          C4 URL-seen anti-join semantics
  batch_dedup_stable     C3 order-stable first-occurrence dedup (min_by)
  doc_fingerprint_dups   C2/C6 fingerprint duplicate detection
  dedup_exact            training: exact text dedup (hash groupBy)
  token_counts           training: token counting per language
  quality_scores         training: punctuation/uppercase quality ratios
  lang_distribution      training: corpus language histogram
  ann_cosine_topk        training: brute-force cosine top-k similarity
  ann_ivf_topk           training: IVF-flat ANN (deterministic cells + nprobe)
  near_dup_cross_check   training: text near-dup pairs scored with embedding cosine
  events_daily_rollup    streaming-table rollup (event-time day windows)
  crawl_trace_synthetic  the flagship frontier loop (non-SQL; rows-only)
  minhash_near_dup       training: MinHash-LSH near-dup candidates (non-SQL)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_T = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# ---------------------------------------------------------------------------
# relational / crawl-operator queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _load(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


def q_top_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _load(spark, sf_dir, "customer", "nation", "orders")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), "n_name")
        .limit(5)
    )


def q_active_dedup_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _load(spark, sf_dir, "customer", "orders")
    active = t["orders"].where(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_frontier_topk_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk",
                F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_custkey", "rk")
    )


def q_politeness_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host per-batch quota accounting: how many orders each customer
    placed per order-date 'batch', capped view (P1 discretization)."""
    o = _load(spark, sf_dir, "orders")["orders"]
    day = F.to_date("o_orderdate").alias("batch_day")
    return (
        o.select("o_custkey", day, "o_orderkey")
        .groupBy("o_custkey", "batch_day")
        .agg(F.count("*").alias("scheduled"))
        .where(F.col("scheduled") >= 2)
        .orderBy("o_custkey", "batch_day")
    )


def q_priority_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: numeric priority mapping (high=0, normal=100, low=1000) +
    deterministic (priority, seq) order + limit — the beanstalkd tube
    discipline (lib/queue/queue_manager.py:21-26) as a window-ranked slice."""
    o = _load(spark, sf_dir, "orders")["orders"]
    prio = (
        F.when(F.col("o_orderpriority").startswith("1"), 0)
        .when(F.col("o_orderpriority").startswith("2"), 100)
        .otherwise(1000)
        .alias("priority")
    )
    return (
        o.select("o_orderkey", prio, "o_orderdate")
        .orderBy("priority", "o_orderdate", "o_orderkey")
        .limit(200)
    )


def q_sitemap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: sitemap scoring with a frozen clock — priority + recency
    max(0, 1 - days_since/365) (lib/utils/sitemap_utils.py:374-433)."""
    o = _load(spark, sf_dir, "orders")["orders"]
    days = F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
    base = (
        F.when(F.col("o_orderpriority").startswith("1"), 0.5)
        .when(F.col("o_orderpriority").startswith("2"), 0.4)
        .otherwise(0.1)
    )
    score = F.round(base + F.greatest(F.lit(0.0), 1 - days / F.lit(365.0)), 4)
    return (
        o.select("o_orderkey", score.alias("score"))
        .orderBy(F.desc("score"), "o_orderkey")
        .limit(100)
    )


# --- URL-shaped queries over synthesized URLs (documents table) ------------

_URL_EXPR = (
    "concat('https://h', cast(doc_id % 20 as string), '.example.com/', "
    "lang, '/d', cast(doc_id as string), "
    "case when doc_id % 7 = 0 then '.pdf' "
    "when doc_id % 11 = 0 then '.jpg' "
    "when doc_id % 13 = 0 then '?page=2' else '' end)"
)

_URL_SQL = (
    "('https://h' || cast(doc_id % 20 as varchar) || '.example.com/' || "
    "lang || '/d' || cast(doc_id as varchar) || "
    "case when doc_id % 7 = 0 then '.pdf' "
    "when doc_id % 11 = 0 then '.jpg' "
    "when doc_id % 13 = 0 then '?page=2' else '' end)"
)


def q_url_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F5 over synthesized URLs: count admissible vs filtered per host,
    using the engine's real Column-expression filters."""
    from crawler_distributed_spark.functions.urls import (
        denied_col,
        host_col,
        skipped_extension_col,
        valid_url_col,
    )

    d = _load(spark, sf_dir, "documents")["documents"]
    urls = d.select(F.expr(_URL_EXPR).alias("url"))
    admissible = (
        valid_url_col(F.col("url"))
        & ~denied_col(F.col("url"))
        & ~skipped_extension_col(F.col("url"))
    )
    return (
        urls.select(host_col(F.col("url")).alias("host"), admissible.alias("ok"))
        .groupBy("host")
        .agg(
            F.sum(F.col("ok").cast("long")).alias("admitted"),
            F.sum((~F.col("ok")).cast("long")).alias("filtered"),
        )
        .orderBy("host")
    )


def q_url_normalize_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/F4: canonicalize synthesized URLs (engine UDF) and group by
    host + path depth."""
    from crawler_distributed_spark.functions.urls import canonicalize_udf, host_col

    d = _load(spark, sf_dir, "documents")["documents"]
    urls = d.select(F.expr(_URL_EXPR).alias("url"))
    norm = urls.select(canonicalize_udf("url").alias("url_norm"))
    depth = F.size(F.split(F.regexp_replace("url_norm", r"^[a-z]+://[^/]*/", ""), "/"))
    return (
        norm.select(host_col(F.col("url_norm")).alias("host"), depth.alias("depth"))
        .groupBy("host", "depth")
        .agg(F.count("*").alias("n"))
        .orderBy("host", "depth")
    )


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: seen-set anti-join — docs whose id is NOT in the 'seen' subset."""
    d = _load(spark, sf_dir, "documents")["documents"]
    seen = d.where(F.col("doc_id") % 3 == 0).select("doc_id")
    return (
        d.join(seen, "doc_id", "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def q_batch_dedup_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: order-stable first-occurrence dedup — min (seq) row per key,
    the admission pipeline's min_by discipline."""
    d = _load(spark, sf_dir, "documents")["documents"]
    keyed = d.select(
        (F.col("doc_id") % 97).alias("key"),
        F.col("doc_id").alias("seq"),
        "source",
    )
    win = F.min_by(F.struct("seq", "source"), "seq").alias("w")
    return (
        keyed.groupBy("key")
        .agg(win)
        .select("key", F.col("w.seq").alias("first_seq"), F.col("w.source").alias("source"))
        .orderBy("key")
    )


def q_doc_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C6: content fingerprinting — md5 over a normalized prefix,
    surfacing duplicate groups."""
    d = _load(spark, sf_dir, "documents")["documents"]
    fp = F.md5(F.substring(F.lower(F.col("text")), 1, 32)).alias("fp")
    return (
        d.select(fp)
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .orderBy(F.desc("n"), "fp")
    )


# --- training-data pipeline queries ----------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full text, keep the lowest doc_id."""
    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dups"))
        .select("keep_id", "dups")
        .orderBy("keep_id")
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")["documents"]
    ntok = F.size(F.split("text", " "))
    return (
        d.select("lang", ntok.alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("ntok").alias("tokens"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + non-alpha ratio per source bucket."""
    d = _load(spark, sf_dir, "documents")["documents"]
    nonalpha = F.length(F.regexp_replace("text", "[a-z ]", ""))
    ratio = F.round(nonalpha / F.greatest(F.length("text"), F.lit(1)), 4)
    return (
        d.select("source", F.length("text").alias("len"), ratio.alias("junk_ratio"))
        .groupBy("source")
        .agg(
            F.round(F.avg("len"), 2).alias("avg_len"),
            F.round(F.avg("junk_ratio"), 4).alias("avg_junk"),
            F.count("*").alias("docs"),
        )
        .orderBy("source")
    )


def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")["documents"]
    return d.groupBy("lang").agg(F.count("*").alias("n")).orderBy("lang")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: nearest 10 vectors to vec_id=0, JVM-side
    via zip_with/aggregate (no Python in the hot path)."""
    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    qvec = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    joined = e.where(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    dot = F.aggregate(
        F.zip_with("embedding", "q", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x))
    norm_q = F.sqrt(F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.round(dot / (norm_a * norm_q), 4)
    return (
        joined.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def q_events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")["events"]
    day = F.to_date("ts").alias("day")
    return (
        ev.select(day, "event_type", "value")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("day", "event_type")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic over documents; distribution
    of guessed languages."""
    from crawler_distributed_spark.pipelines.text import lang_guess

    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(lang_guess(F.col("text")).alias("guess"))
        .groupBy("guess")
        .agg(F.count("*").alias("n"))
        .orderBy("guess")
    )


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (words + punctuation + long-word splits)."""
    from crawler_distributed_spark.pipelines.text import bpe_ish_token_count

    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        d.select("lang", bpe_ish_token_count(F.col("text")).alias("btok"))
        .groupBy("lang")
        .agg(F.sum("btok").alias("bpe_tokens"), F.count("*").alias("docs"))
        .orderBy("lang")
    )


_BPE_VOCAB = [
    # corpus words (in the committed merges' training vocabulary) mixed
    # with novel compounds/typos the model has never seen — those must
    # split into real subword sequences, exercising the merge replay
    "spark", "table", "query", "customer", "window", "filter", "vector",
    "batch", "merge", "hash", "value", "group", "order", "column", "scan",
    "join", "line", "slow", "fast", "small", "big", "row", "key", "agg",
    "sparkplanner", "checkpointing", "tokenizers", "querying", "joining",
    "hypertable", "shufflewrite", "broadcasting", "decontaminate",
    "pretraining", "subword", "bytepair", "vocabulary", "frequencies",
    "zzqxy", "qwpd", "databricks", "parquet", "arrow", "catalyst",
    "tungsten", "executor", "politeness", "frontier",
]
_BPE_N_DOCS = 400


def _bpe_corpus_texts() -> list[str]:
    """The deterministic BPE benchmark corpus — the SAME formula is
    evaluated distributed in Column expressions on the Spark side
    (q_real_bpe_token_counts) and here for the shipped pure-Python
    oracle, so neither side reads the other's output."""
    nv = len(_BPE_VOCAB)
    out = []
    for i in range(_BPE_N_DOCS):
        words = [_BPE_VOCAB[(i * 7 + j * 13) % nv] for j in range(10 + i % 9)]
        out.append(" ".join(words) + ("." if i % 3 == 0 else ""))
    return out


def q_real_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL learned-BPE token counting (VERDICT r4 #2): the committed
    merges table (data/bpe_merges.txt, scripts/learn_bpe.py) is replayed
    greedily by rank inside an Arrow pandas UDF over an explicitly
    hash-repartitioned corpus; the DuckDB oracle reads a parquet written
    by an INDEPENDENT in-rank-order scan encoder applying the same
    merges. The corpus itself is generated distributed from the
    deterministic formula (spark.range + Column exprs — the driver never
    builds the rows)."""
    from crawler_distributed_spark.pipelines.bpe import bpe_token_counts

    nv = len(_BPE_VOCAB)
    vocab = F.array(*[F.lit(w) for w in _BPE_VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(9) + (F.col("id") % 9).cast("int")),
        lambda j: F.get(vocab, ((F.col("id") * 7 + j * 13) % nv).cast("int")),
    )
    docs = spark.range(_BPE_N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(words, " "),
            F.when(F.col("id") % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return bpe_token_counts(docs, n_docs_hint=_BPE_N_DOCS).orderBy("doc_id")


def q_doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash doc fingerprint duplicate groups (xxhash64 over the
    normalized prefix) — counts per distinct fingerprint bucket size."""
    from crawler_distributed_spark.pipelines.text import doc_fingerprint

    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("groups"))
        .orderBy("n")
    )


# --- non-SQL-expressible (rows-only checks) ---------------------------------


_SHIP_DIR = "/tmp/spark_graft_oracle"
_TRACE_CFG = dict(n_hosts=2, pages_base=8, hot_factor=2, branching=4)
_TRACE_MAX_PAGES = 5
_SPAN_CFG = dict(n_hosts=3, pages_base=20, hot_factor=2, branching=5)


def _ship_oracle_trace() -> str:
    """Run the pure-Python reference-semantics oracle (oracle.py) on the
    trace config and ship its trace as parquet, so the driver's DuckDB
    side can diff the Spark engine's trace against an INDEPENDENT
    implementation of the same crawl semantics."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.oracle import run_oracle
    from crawler_distributed_spark.policy import CrawlPolicy

    path = os.path.join(_SHIP_DIR, "oracle_trace.parquet")
    os.makedirs(_SHIP_DIR, exist_ok=True)
    cfg = synth.SynthConfig(**_TRACE_CFG)
    res = run_oracle(cfg, synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES), CrawlPolicy())
    cols = list(zip(*res.trace)) or [[]] * 6
    table = pa.table(
        {
            "crawl_id": pa.array(cols[0], pa.string()),
            "batch_id": pa.array(cols[1], pa.int64()),
            "seq_in_batch": pa.array(cols[2], pa.int32()),
            "url_norm": pa.array(cols[3], pa.string()),
            "host": pa.array(cols[4], pa.string()),
            "depth": pa.array(cols[5], pa.int32()),
        }
    )
    pq.write_table(table, path)
    return path


def _ship_oracle_host_stats() -> str:
    """A1 per-domain fetch stats (VERDICT r4 #6): run the pure-Python
    oracle on the trace config and ship its per-(crawl, batch, host)
    requests/successes/failures/bytes rows — the engine's
    CrawlRunResult.metrics() over its own fetched table must aggregate
    to exactly these (stats_middleware.py:86-98,214-239 semantics)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.oracle import run_oracle
    from crawler_distributed_spark.policy import CrawlPolicy

    path = os.path.join(_SHIP_DIR, "oracle_host_stats.parquet")
    os.makedirs(_SHIP_DIR, exist_ok=True)
    cfg = synth.SynthConfig(**_TRACE_CFG)
    res = run_oracle(
        cfg, synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES), CrawlPolicy()
    )
    keys = sorted(res.host_metrics)
    vals = [res.host_metrics[k] for k in keys]
    pq.write_table(
        pa.table(
            {
                "crawl_id": pa.array([k[0] for k in keys], pa.string()),
                "batch_id": pa.array([k[1] for k in keys], pa.int64()),
                "host": pa.array([k[2] for k in keys], pa.string()),
                "requests": pa.array([v[0] for v in vals], pa.int64()),
                "successes": pa.array([v[1] for v in vals], pa.int64()),
                "failures": pa.array([v[2] for v in vals], pa.int64()),
                "bytes": pa.array([v[3] for v in vals], pa.int64()),
            }
        ),
        path,
    )
    return path


def _ship_oracle_bpe() -> str:
    """INDEPENDENT BPE encoder for the real_bpe_token_counts oracle: it
    applies the committed merges IN RANK ORDER with a full scan-replace
    per merge (provably equivalent to the engine's greedy
    lowest-rank-first loop — a merge's parts must exist before it, so
    exhausting merges in creation order can never strand a lower-ranked
    pair), over the same deterministic corpus formula. Only the merges
    FILE and the pre-tokenizer regex are shared contract; the encoding
    code path is disjoint from pipelines/bpe.encode_word."""
    import os
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_distributed_spark.pipelines.bpe import (
        END_OF_WORD,
        load_merge_ranks,
    )

    path = os.path.join(_SHIP_DIR, "oracle_bpe.parquet")
    os.makedirs(_SHIP_DIR, exist_ok=True)
    merges = sorted(load_merge_ranks().items(), key=lambda kv: kv[1])
    pretok = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")

    cache: dict[str, int] = {}

    def n_tokens_of(word: str) -> int:
        c = cache.get(word)
        if c is not None:
            return c
        syms = list(word) + [END_OF_WORD]
        for (a, b), _rank in merges:
            if len(syms) == 1:
                break
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = len(syms)
        return len(syms)

    counts = [
        sum(n_tokens_of(w) for w in pretok.findall(t))
        for t in _bpe_corpus_texts()
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(_BPE_N_DOCS), pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        ),
        path,
    )
    return path


_HEALTH_MAX_BATCHES = 3  # truncate so a non-trivial frontier remains


def _ship_oracle_health() -> str:
    """Run the pure-Python oracle TRUNCATED at _HEALTH_MAX_BATCHES and
    ship the expected A4 queue-health rows (per-crawl queued / retry
    backlog / delayed / budget / status) — the engine's purged final
    frontier state must aggregate to exactly these rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.oracle import run_oracle
    from crawler_distributed_spark.policy import CrawlPolicy

    path = os.path.join(_SHIP_DIR, "oracle_health.parquet")
    os.makedirs(_SHIP_DIR, exist_ok=True)
    cfg = synth.SynthConfig(**_TRACE_CFG)
    seeds = synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES)
    pol = CrawlPolicy(max_batches=_HEALTH_MAX_BATCHES)
    res = run_oracle(cfg, seeds, pol)
    last_batch = _HEALTH_MAX_BATCHES - 1
    rows = []
    for s in sorted(seeds, key=lambda s: s["crawl_id"]):
        cid = s["crawl_id"]
        left = [e for e in res.frontier_left if e[0] == cid]
        pages, failed = res.pages_crawled[cid], res.failed_pages[cid]
        if pages >= s["max_pages"]:
            status = "completed"
        elif failed >= pol.max_failed_pages:
            status = "failed_out"
        elif not left:
            status = "exhausted"
        else:
            status = "waiting"
        rows.append(
            (cid, pages, failed, s["max_pages"], len(left),
             sum(1 for e in left if e[2] > 0),
             sum(1 for e in left if e[3] > last_batch), status)
        )
    cols = list(zip(*rows))
    table = pa.table(
        {
            "crawl_id": pa.array(cols[0], pa.string()),
            "pages": pa.array(cols[1], pa.int32()),
            "failed": pa.array(cols[2], pa.int32()),
            "max_pages": pa.array(cols[3], pa.int32()),
            "queued": pa.array(cols[4], pa.int64()),
            "retry_backlog": pa.array(cols[5], pa.int64()),
            "delayed": pa.array(cols[6], pa.int64()),
            "status": pa.array(cols[7], pa.string()),
        }
    )
    pq.write_table(table, path)
    return path


def q_queue_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 queue-health view over a mid-run crawl state (truncated at
    _HEALTH_MAX_BATCHES): the engine's purged frontier + budget state vs
    the pure-Python oracle's expected rows (independent implementation)."""
    import shutil

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy

    cfg = synth.SynthConfig(**_TRACE_CFG)
    seeds = synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
    ck = f"{_SHIP_DIR}/ck_health"
    shutil.rmtree(ck, ignore_errors=True)  # our own scratch dir, always fresh
    res = run_crawl(
        spark, cfg, seeds, robots, ck,
        CrawlPolicy(max_batches=_HEALTH_MAX_BATCHES),
    )
    return res.health(spark).orderBy("crawl_id")


def q_crawl_trace_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship operator: the full frontier loop on a small synthetic
    web; returns the ordering trace. The DuckDB oracle reads the shipped
    pure-Python oracle trace (same semantics, independent implementation)
    — also asserted in pytest (tests/test_trace_equality.py)."""
    import shutil

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy

    cfg = synth.SynthConfig(**_TRACE_CFG)
    seeds = synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
    ck = f"{_SHIP_DIR}/ck_trace"
    shutil.rmtree(ck, ignore_errors=True)  # our own scratch dir, always fresh
    res = run_crawl(spark, cfg, seeds, robots, ck, CrawlPolicy())
    return res.trace(spark).orderBy("batch_id", "crawl_id", "seq_in_batch")


def q_crawl_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-domain fetch stats over the crawl's OWN output (VERDICT r4
    #6): run the loop on the trace config and aggregate its fetched
    table to per-(crawl, batch, host) requests/successes/failures/bytes
    (CrawlRunResult.metrics). The DuckDB oracle reads the pure-Python
    oracle's independently accumulated counters for the same config."""
    import shutil

    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy

    cfg = synth.SynthConfig(**_TRACE_CFG)
    seeds = synth.seed_rows(cfg, max_pages=_TRACE_MAX_PAGES)
    robots = spark.createDataFrame(synth.robots_rule_rows(cfg))
    ck = f"{_SHIP_DIR}/ck_host_stats"
    shutil.rmtree(ck, ignore_errors=True)  # our own scratch dir, always fresh
    res = run_crawl(spark, cfg, seeds, robots, ck, CrawlPolicy())
    return (
        res.metrics(spark)
        .select(
            "crawl_id", "batch_id", "host",
            F.col("requests").cast("long").alias("requests"),
            F.col("successes").cast("long").alias("successes"),
            F.col("failures").cast("long").alias("failures"),
            F.col("bytes").cast("long").alias("bytes"),
        )
        .orderBy("crawl_id", "batch_id", "host")
    )


def q_simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature duplicate groups. Portable phash60 token hashing
    (functions/hashing.py) so the DuckDB oracle recomputes the identical
    32-bit signatures; ids emitted as a comma-joined sorted string."""
    from crawler_distributed_spark.pipelines.dedup import simhash_dup_groups

    d = _load(spark, sf_dir, "documents")["documents"]
    return simhash_dup_groups(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        bits=32,
        portable=True,
    ).orderBy("simhash")


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming radius 3 over 32-bit portable
    signatures: pigeonhole banding (4 disjoint 8-bit sub-keys — any-band
    equality is a provable superset of radius<=3) + exact popcount verify.
    The DuckDB oracle recomputes signatures, banding and bit_count."""
    from crawler_distributed_spark.pipelines.dedup import simhash_near_dup_pairs

    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        simhash_near_dup_pairs(
            d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
            bits=32,
            radius=3,
            portable=True,
        )
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


_LSH_TOPK_BITS = 8
_NEAR_DUP_BITS = 6
_NEAR_DUP_BANDS = 2
_EMB_DIM = 64  # dim of the driver's embeddings tables (all SFs)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k (the ANN scale path; recall
    vs brute force asserted in pytest). Hyperplanes are integer-valued
    md5-derived constants, so the DuckDB oracle recomputes the identical
    bucket signatures and in-bucket cosine scores."""
    from crawler_distributed_spark.pipelines.similarity import lsh_topk

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(e, queries, dim=_EMB_DIM, k=5, bits=_LSH_TOPK_BITS).orderBy(
        "query_id", "rank"
    )


def q_near_dup_cross_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal verify stage: every text near-dup candidate pair
    (MinHash-LSH over documents) is scored with the embedding-space
    cosine of the same ids — the join a training-data pipeline runs to
    cross-check lexical dedup against semantic similarity before
    dropping rows. Two joins against the embeddings table with the
    candidate-pair side as the small (broadcast) side; the corpus is
    never shuffled."""
    from crawler_distributed_spark.pipelines.dedup import minhash_near_dup_pairs

    d = _load(spark, sf_dir, "documents")["documents"]
    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    pairs = minhash_near_dup_pairs(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        portable=True,
        max_bucket=100,
    )
    ea = e.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("_ea"))
    eb = e.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("_eb"))
    dot = F.aggregate(
        F.zip_with("_ea", "_eb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate("_ea", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("_eb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        pairs.join(ea, "doc_a").join(eb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(dot / (na * nb), 6).alias("emb_cos")
        )
        .orderBy("doc_a", "doc_b")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-k: inverted-file cells from a deterministic
    md5-chosen centroid set, nprobe nearest cells per query, exact
    cosine within probed cells — the DuckDB oracle reproduces the
    centroid set, cell assignment, probes and scores exactly."""
    from crawler_distributed_spark.pipelines.similarity import ivf_topk

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        e, queries, dim=_EMB_DIM, k=5, n_centroids=16, nprobe=4
    ).orderBy("query_id", "rank")


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane-LSH
    (2 bands × 6 bits; a pair is a candidate if it collides in any band).
    The synthetic embeddings are near-orthogonal (max pairwise cos ~0.51)
    so the "near-dup" threshold for this data sits at 0.35."""
    from crawler_distributed_spark.pipelines.similarity import embedding_near_dup_pairs

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    return embedding_near_dup_pairs(
        e, dim=_EMB_DIM, threshold=0.35, bits=_NEAR_DUP_BITS, bands=_NEAR_DUP_BANDS
    ).orderBy("id_a", "id_b")


def _ship_span_docs() -> str:
    """Synthesize the span-doc corpus (deterministic, FIXTURES.md) and ship
    it as parquet — BOTH the Spark query and the DuckDB oracle read this
    file, then compute the extraction fields independently."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_distributed_spark import synth

    path = os.path.join(_SHIP_DIR, "span_docs.parquet")
    os.makedirs(_SHIP_DIR, exist_ok=True)
    cfg = synth.SynthConfig(**_SPAN_CFG)
    rows = []
    for u in synth.all_urls(cfg):
        spans = synth.spans_of(cfg, u)
        if not spans:
            continue
        rows.append(
            (
                synth.doc_id_of(u),
                u,
                u.split("/")[2],
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans
                ],
            )
        )
    span_t = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "url_norm": pa.array([r[1] for r in rows], pa.string()),
            "host": pa.array([r[2] for r in rows], pa.string()),
            "spans": pa.array([r[3] for r in rows], span_t),
        }
    )
    pq.write_table(table, path)
    return path


def q_span_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The W1-W18 extraction surface over interleaved span docs. The DuckDB
    oracle recomputes every output field from the same shipped parquet
    with list/lambda SQL; per-family equality vs the span oracle is also
    asserted in pytest."""
    from crawler_distributed_spark.extract.spans import parse_docs

    docs = spark.read.parquet(_ship_span_docs())
    parsed = parse_docs(docs)
    return parsed.select(
        "doc_id",
        F.col("page_title.title").alias("title"),
        F.col("headings_data.count").alias("n_headings"),
        F.col("headings_data.h1").alias("n_h1"),
        F.col("links_data.total").alias("n_links"),
        F.col("links_data.internal").alias("n_internal"),
        F.col("links_data.nofollow").alias("n_nofollow"),
        F.col("images_data.total").alias("n_images"),
        F.col("javascript_data.total").alias("n_scripts"),
        F.col("text_metrics.word_count").alias("words"),
        F.col("text_metrics.sentence_count").alias("sentences"),
        F.col("page_title.og_count").alias("n_og"),
        F.col("structured_data.schema_count").alias("n_schema"),
        F.col("third_party_services.cms").alias("cms"),
        F.col("third_party_services.page_builder").alias("page_builder"),
        F.col("uri_data.depth").alias("uri_depth"),
        F.col("mobile_data.score").alias("mobile_score"),
        F.col("mobile_data.media_queries_count").alias("n_media_queries"),
        F.col("pagespeed_data.has_minified_css").cast("int").alias("min_css"),
        F.col("pagespeed_data.has_minified_js").cast("int").alias("min_js"),
        F.size("third_party_services.providers").alias("n_providers"),
        F.col("directives_data.is_indexable").alias("indexable"),
    ).orderBy("doc_id")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature plumbing over synthetic binary media
    (deterministic stub kernel; rows-only)."""
    from crawler_distributed_spark.pipelines.multimodal import (
        extract_features,
        synth_media_docs,
    )

    media = synth_media_docs(spark, n=60)
    return (
        extract_features(media, dims=8)
        .select("media_id", F.round(F.expr("aggregate(feature, 0D, (a,x) -> a + x)"), 4).alias("feat_sum"))
        .orderBy("media_id")
    )


def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode over binary payloads: the engine byte-parses
    BMP/PPM/PNG images (png = stdlib zlib inflate + five-filter scanline
    reconstruction), PCM WAV audio, and ISO-BMFF MP4 containers (box
    walk: timescale/duration/tracks/dimensions/mdat size — codec-free
    metadata, the CPU tier's real job before frames go to codec workers)
    while the DuckDB oracle recomputes every feature from the corpus'
    generative formulas in closed form — the encoder and decoder must
    agree bit-for-bit through float32 for all five formats."""
    from crawler_distributed_spark.pipelines.multimodal import (
        extract_features,
        synth_media_docs_real,
    )

    media = synth_media_docs_real(spark, n=60)
    feats = extract_features(media, dims=8, real_decode=True)
    per_dim = [
        F.round(F.col("feature").getItem(k).cast("double"), 4).alias(f"f{k}")
        for k in range(8)
    ]
    return feats.select(
        "media_id", F.col("decode_ok").cast("int").alias("decode_ok"), *per_dim
    ).orderBy("media_id")


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs over documents. Portable
    phash60 signature/band hashing so the DuckDB oracle replicates the
    banding exactly; degenerate band buckets capped at 100 members."""
    from crawler_distributed_spark.pipelines.dedup import minhash_near_dup_pairs

    d = _load(spark, sf_dir, "documents")["documents"]
    return minhash_near_dup_pairs(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        portable=True,
        max_bucket=100,
    ).orderBy("doc_a", "doc_b")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution over the MinHash-LSH near-dup pair
    graph: iterative min-label propagation (Spark's standard connected-
    components shape) assigns every paired doc its cluster's minimum doc
    id — the keep-one-per-cluster step of a dedup pipeline. The DuckDB
    oracle computes true components with a recursive transitive-closure
    CTE over the identical pair set, so early-exit/iteration-bound bugs
    hash-fail here."""
    from crawler_distributed_spark.pipelines.dedup import (
        dup_clusters,
        minhash_near_dup_pairs,
    )

    d = _load(spark, sf_dir, "documents")["documents"]
    pairs = minhash_near_dup_pairs(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        portable=True,
        max_bucket=100,
    )
    return dup_clusters(pairs).orderBy("doc_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over the MinHash-LSH candidate pairs — the
    verify stage of the near-dup pipeline (candidates → shingles join,
    never quadratic in hot-shingle frequency)."""
    from crawler_distributed_spark.pipelines.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    d = _load(spark, sf_dir, "documents")["documents"].select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    cand = minhash_near_dup_pairs(d, portable=True, max_bucket=100)
    return ngram_jaccard_pairs(d, threshold=0.1, candidates=cand).orderBy(
        "doc_a", "doc_b"
    )


def q_link_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-analysis crawl priority: 3-iteration N-scaled PageRank over
    the deterministic synthetic outlink graph (pipelines/graph.py), top
    100 nodes — the classic priority source a web-scale scheduler feeds
    into the Q2 numeric-priority order key. The DuckDB oracle unrolls
    the identical recurrence as CTEs, so a wrong damping/outdeg/dangling
    treatment or a lost isolated node hash-fails."""
    from crawler_distributed_spark.pipelines.graph import (
        pagerank,
        synthetic_link_edges,
    )

    d = _load(spark, sf_dir, "documents")["documents"]
    edges = synthetic_link_edges(d)
    nodes = d.select(F.col("doc_id").alias("id"))
    pr = pagerank(nodes, edges, n_iters=3)
    return (
        pr.select(F.col("id").alias("doc_id"), F.round("pr", 6).alias("pr"))
        .orderBy(F.col("pr").desc(), "doc_id")
        .limit(100)
    )


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: mark corpus docs sharing ANY word
    3-gram with a deterministic contaminant slice (doc_id % 97 == 0 —
    the stand-in for a benchmark suite). The contaminant shingle set is
    broadcast; the corpus shingles once and never self-joins."""
    from crawler_distributed_spark.pipelines.cleaning import decontaminate_flags

    d = _load(spark, sf_dir, "documents")["documents"].select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    bad = d.where(F.col("doc_id") % 97 == 0)
    return (
        decontaminate_flags(d, bad, n=3)
        .select("doc_id", F.col("contaminated").cast("int").alias("contaminated"))
        .orderBy("doc_id")
    )


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram quality signal (Gopher/MassiveText-style): per-doc
    fraction of duplicate word 3-grams, pure Column expressions."""
    from crawler_distributed_spark.pipelines.cleaning import repetition_ratio

    d = _load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round(repetition_ratio("text", 3), 4).alias("rep3"),
        )
        .where(F.col("rep3") > 0)
        .orderBy("doc_id")
    )


def q_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit: deterministic emails/IPs/phones are injected
    into each doc (both engines build the identical string), scrubbed
    with the SAME regex patterns (RE2 ∩ Java subset), and the scrubbed
    text is phash60'd — a wrong pattern, missed occurrence, or partial
    (non-global) replace hash-fails."""
    from crawler_distributed_spark.pipelines.cleaning import pii_count, pii_scrub

    d = _load(spark, sf_dir, "documents")["documents"]
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call +1 555 010 "),
        (F.col("doc_id") % 90 + 10).cast("string"),
    )
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"), injected.alias("text"))
    return base.select(
        "doc_id",
        pii_count("text").alias("n_pii"),
        F.conv(F.substring(F.md5(pii_scrub("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("clean_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: URL admission + canonicalize + per-host ranking over
    sf0.001, exercising the engine's real admission operators."""
    sf_dir = "/root/testdata/sf0.001"
    return q_url_admission(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "status_histogram": q_status_histogram,
        "top_hosts": q_top_hosts,
        "active_dedup_antijoin": q_active_dedup_antijoin,
        "frontier_topk_per_host": q_frontier_topk_per_host,
        "politeness_quota": q_politeness_quota,
        "priority_schedule": q_priority_schedule,
        "sitemap_score": q_sitemap_score,
        "url_admission": q_url_admission,
        "url_normalize_hosts": q_url_normalize_hosts,
        "seen_antijoin": q_seen_antijoin,
        "batch_dedup_stable": q_batch_dedup_stable,
        "doc_fingerprint_dups": q_doc_fingerprint_dups,
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "lang_distribution": q_lang_distribution,
        "ann_cosine_topk": q_ann_cosine_topk,
        "events_daily_rollup": q_events_daily_rollup,
        "lang_id": q_lang_id,
        "bpe_token_counts": q_bpe_token_counts,
        "real_bpe_token_counts": q_real_bpe_token_counts,
        "doc_rolling_fingerprint": q_doc_rolling_fingerprint,
        "crawl_trace_synthetic": q_crawl_trace_synthetic,
        "crawl_host_stats": q_crawl_host_stats,
        "queue_health": q_queue_health,
        "minhash_near_dup": q_minhash_near_dup,
        "dedup_clusters": q_dedup_clusters,
        "ngram_jaccard": q_ngram_jaccard,
        "link_pagerank_topk": q_link_pagerank_topk,
        "decontamination": q_decontamination,
        "repetition_scores": q_repetition_scores,
        "pii_scrub_audit": q_pii_scrub_audit,
        "simhash_dup_groups": q_simhash_dup_groups,
        "simhash_near_dup": q_simhash_near_dup,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "near_dup_cross_check": q_near_dup_cross_check,
        "embedding_near_dup": q_embedding_near_dup,
        "span_extraction": q_span_extraction,
        "multimodal_features": q_multimodal_features,
        "multimodal_real_decode": q_multimodal_real_decode,
    }


# ---------------------------------------------------------------------------
# oracle-SQL generators (portable-hash twins of the engine operators)
# ---------------------------------------------------------------------------


def _phash_sql(expr: str) -> str:
    """DuckDB twin of functions/hashing.py::phash60."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# Shared CTE block: word-3-gram shingles -> one 60-bit base hash per
# shingle -> 16 universal-hash permutations ((A_k*h0+B_k) mod P, same
# literal coefficients as pipelines/dedup.py::minhash_coeffs) -> 4 bands
# (phash60 band hash) -> bucket-capped LSH candidate pairs. Mirrors
# minhash_near_dup_pairs(portable=True, max_bucket=100).
from crawler_distributed_spark.pipelines.dedup import (  # noqa: E402
    MINHASH_P as _MH_P,
    minhash_coeffs as _mh_coeffs,
)
from crawler_distributed_spark.pipelines.graph import (  # noqa: E402
    EDGE_MUL as _PR_MUL,
    EDGE_STEP as _PR_STEP,
)
from crawler_distributed_spark.pipelines.cleaning import (  # noqa: E402
    PII_PATTERNS as _PII_PATTERNS,
)

# DuckDB twins generated from the SAME pattern table the engine scrubs
# with (cleaning.PII_PATTERNS — RE2 ∩ Java common subset, so the literal
# pattern strings run on both engines; DuckDB needs the 'g' flag for the
# replace-all semantics Java applies by default)
_PII_SCRUB_SQL = "t"
for _pat, _repl in _PII_PATTERNS:
    _PII_SCRUB_SQL = f"regexp_replace({_PII_SCRUB_SQL}, '{_pat}', '{_repl}', 'g')"
_PII_COUNT_SQL = " + ".join(
    f"((length(s) - length(replace(s, '{_repl}', ''))) / {len(_repl)})::INT"
    for _pat, _repl in _PII_PATTERNS
)

# word-3-gram shingle CTEs shared by the cleaning oracles (the DuckDB
# twin of pipelines/dedup._shingles — same shape the minhash CTEs use)
_SHINGLE_TOKS = (
    "toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ts "
    "FROM documents)"
)
_SHINGLE_LIST = (
    "list_transform(range(0, greatest(len(ts) - 3, 0) + 1), "
    "i -> array_to_string(ts[i + 1 : i + 3], ' '))"
)

_MH_COEFF_VALUES = ", ".join(
    f"({k}, {a}, {b})" for k, (a, b) in enumerate(_mh_coeffs(16))
)

_MINHASH_CTES = f"""
        toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ts
                 FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_transform(range(0, greatest(len(ts) - 3, 0) + 1),
                             i -> array_to_string(ts[i + 1 : i + 3], ' '))) AS shingle
               FROM toks),
        h0 AS (SELECT doc_id,
                      ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_MH_P} AS h0
               FROM sh),
        mh AS (SELECT doc_id, c.k AS k, min((c.a * h0 + c.b) % {_MH_P}) AS mh
               FROM h0, (VALUES {_MH_COEFF_VALUES}) AS c(k, a, b)
               GROUP BY doc_id, c.k),
        bands AS (SELECT doc_id, (k // 4) AS band_id,
                         ('0x' || substr(md5(string_agg(mh::VARCHAR, '|' ORDER BY k)), 1, 15))::BIGINT AS band_hash
                  FROM mh GROUP BY doc_id, (k // 4)),
        capped AS (SELECT doc_id, band_id, band_hash FROM (
                     SELECT doc_id, band_id, band_hash,
                            count(*) OVER (PARTITION BY band_id, band_hash) AS bn
                     FROM bands) WHERE bn <= 100),
        pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM capped x JOIN capped y
                    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
                   AND x.doc_id < y.doc_id)
"""


def _dot_sql(a: str, b: str, dim: int = _EMB_DIM) -> str:
    """Left-associated double dot product — bit-identical to the engine's
    aggregate(zip_with(...)) fold (pipelines/similarity.py::_dot)."""
    return " + ".join(f"{a}[{d}]::DOUBLE * {b}[{d}]::DOUBLE" for d in range(1, dim + 1))


def _cos_sql(a: str, b: str, dim: int = _EMB_DIM) -> str:
    return (
        f"round(({_dot_sql(a, b, dim)}) / "
        f"(sqrt({_dot_sql(a, a, dim)}) * sqrt({_dot_sql(b, b, dim)})), 6)"
    )


def _sig_sql(emb: str, plane_indices: list[int], dim: int = _EMB_DIM) -> str:
    """DuckDB twin of pipelines/similarity.py::signature_col over the
    md5-derived integer hyperplanes (same literal constants)."""
    from crawler_distributed_spark.pipelines.similarity import _hyperplane

    terms = []
    for i, pidx in enumerate(plane_indices):
        plane = _hyperplane(dim, pidx)
        dot = " + ".join(
            f"{emb}[{d + 1}]::DOUBLE * ({int(c)}.0)" for d, c in enumerate(plane)
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0.0 THEN {2**i}::BIGINT ELSE 0::BIGINT END)")
    return "(" + " + ".join(terms) + ")"


def _ivf_sums_sql(dim: int) -> str:
    """Per-dim integer cell sums for the IVF Lloyd step — exact,
    addition-order-independent twins of pipelines/similarity.py."""
    return ", ".join(
        f"sum(floor(embedding[{d + 1}]::DOUBLE * 1000)::BIGINT) AS s{d}"
        for d in range(dim)
    )


def _ivf_lvec_sql(dim: int) -> str:
    return "[" + ", ".join(f"floor(s{d} / n)::DOUBLE" for d in range(dim)) + "]"


def _multimodal_feat_sql(dims: int = 8) -> str:
    """DuckDB twin of pipelines/multimodal.py::_fake_decode_feature summed:
    each dim is rounded through FLOAT4 (the engine stores float32)."""
    terms = " + ".join(
        f"CAST(CAST(((h >> {3 * i}) & 255) / 255.0 AS FLOAT) AS DOUBLE)"
        for i in range(dims)
    )
    return f"round(0.0 + {terms}, 4)"


def oracle_sql() -> dict[str, str]:
    # ship the independent-oracle fixtures so the SQL below is runnable
    # regardless of whether the Spark queries have executed yet (both
    # writers are deterministic and idempotent)
    trace_path = _ship_oracle_trace()
    span_path = _ship_span_docs()
    health_path = _ship_oracle_health()
    bpe_path = _ship_oracle_bpe()
    host_stats_path = _ship_oracle_host_stats()
    # page-builder class-token CASE list, generated from the SAME
    # signature table the engine uses (extract/spans.py) so the two
    # sides cannot drift
    from crawler_distributed_spark.extract.spans import (
        INLINE_JS_SIGNATURES,
        PAGE_BUILDER_SIGNATURES,
        THIRD_PARTY_SIGNATURES,
    )

    _builder_case_sql = ", ".join(
        f"CASE WHEN contains(bc, '{sig}') THEN '{name}' END"
        for name, sig in PAGE_BUILDER_SIGNATURES.items()
    )
    # provider count: src-signature over external refs OR inline-JS token
    # over inline script bodies — generated from the SAME tables the
    # engine uses (extract/spans.py) so the two sides cannot drift
    _tp_conds = []
    for name, sig in THIRD_PARTY_SIGNATURES.items():
        cond = f"len(list_filter(extrefs, r -> contains(r, '{sig}'))) > 0"
        for tok in INLINE_JS_SIGNATURES.get(name, ()):
            esc = tok.replace("'", "''")
            cond += f" OR len(list_filter(inljs, b -> contains(b, '{esc}'))) > 0"
        _tp_conds.append(f"(CASE WHEN {cond} THEN 1 ELSE 0 END)")
    _tp_count_sql = " + ".join(_tp_conds)
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "status_histogram": """
            SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "top_hosts": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 5
        """,
        "active_dedup_antijoin": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
            ORDER BY c_custkey
        """,
        "frontier_topk_per_host": """
            SELECT o_custkey, o_orderkey, rk, price FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk,
                     round(o_totalprice, 2) AS price
              FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk
        """,
        "politeness_quota": """
            SELECT o_custkey, cast(o_orderdate AS date) AS batch_day,
                   count(*) AS scheduled
            FROM orders GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY o_custkey, batch_day
        """,
        "priority_schedule": """
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority LIKE '1%' THEN 0
                        WHEN o_orderpriority LIKE '2%' THEN 100
                        ELSE 1000 END AS priority,
                   o_orderdate
            FROM orders ORDER BY priority, o_orderdate, o_orderkey LIMIT 200
        """,
        "sitemap_score": """
            SELECT o_orderkey,
                   round(CASE WHEN o_orderpriority LIKE '1%' THEN 0.5
                              WHEN o_orderpriority LIKE '2%' THEN 0.4
                              ELSE 0.1 END
                         + greatest(0.0, 1 - datediff('day', cast(o_orderdate AS date),
                                                      DATE '1998-12-31') / 365.0),
                         4) AS score
            FROM orders ORDER BY score DESC, o_orderkey LIMIT 100
        """,
        "url_admission": f"""
            WITH u AS (SELECT {_URL_SQL} AS url FROM documents)
            SELECT regexp_extract(url, '^https://([^/]*)', 1) AS host,
                   sum(CASE WHEN url SIMILAR TO '.*\\.(pdf|jpg)'
                             OR url LIKE '%?page=2' THEN 0 ELSE 1 END)::BIGINT AS admitted,
                   sum(CASE WHEN url SIMILAR TO '.*\\.(pdf|jpg)'
                             OR url LIKE '%?page=2' THEN 1 ELSE 0 END)::BIGINT AS filtered
            FROM u GROUP BY 1 ORDER BY host
        """,
        "url_normalize_hosts": f"""
            WITH u AS (SELECT {_URL_SQL} AS url FROM documents),
            n AS (SELECT CASE WHEN url LIKE '%?page=2'
                              THEN substr(url, 1, length(url) - 7)
                              ELSE url END AS url_norm FROM u)
            SELECT regexp_extract(url_norm, '^https://([^/]*)', 1) AS host,
                   len(string_split(regexp_replace(url_norm, '^[a-z]+://[^/]*/', ''),
                                    '/')) AS depth,
                   count(*) AS n
            FROM n GROUP BY 1, 2 ORDER BY host, depth
        """,
        "seen_antijoin": """
            SELECT doc_id, lang FROM documents
            WHERE doc_id % 3 <> 0 ORDER BY doc_id
        """,
        "batch_dedup_stable": """
            SELECT key, seq AS first_seq, source FROM (
              SELECT doc_id % 97 AS key, doc_id AS seq, source,
                     row_number() OVER (PARTITION BY doc_id % 97 ORDER BY doc_id) AS rn
              FROM documents) t
            WHERE rn = 1
            ORDER BY key
        """,
        "doc_fingerprint_dups": """
            SELECT md5(substr(lower(text), 1, 32)) AS fp, count(*) AS n
            FROM documents GROUP BY 1 HAVING count(*) > 1
            ORDER BY n DESC, fp
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS dups
            FROM documents GROUP BY md5(text) ORDER BY keep_id
        """,
        "token_counts": """
            SELECT lang, count(*) AS docs,
                   sum(len(string_split(text, ' ')))::BIGINT AS tokens,
                   round(avg(len(string_split(text, ' '))), 2) AS avg_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "quality_scores": """
            SELECT source,
                   round(avg(length(text)), 2) AS avg_len,
                   round(avg(round(length(regexp_replace(text, '[a-z ]', '', 'g'))
                             / greatest(length(text), 1), 4)), 4) AS avg_junk,
                   count(*) AS docs
            FROM documents GROUP BY source ORDER BY source
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding, qv), 4) AS cos_sim
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
        "events_daily_rollup": """
            SELECT cast(ts AS date) AS day, event_type,
                   count(*) AS n, round(sum(value), 2) AS total
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "lang_id": """
            WITH s AS (
              SELECT
                len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x IN ('the','and','of','is'))) AS s_en,
                len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x IN ('el','la','los','es'))) AS s_es,
                len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x IN ('der','die','und','ist'))) AS s_de,
                len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x IN ('le','la','les','est'))) AS s_fr
              FROM documents)
            SELECT CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                        WHEN s_de >= s_fr THEN 'de'
                        ELSE 'fr' END AS guess,
                   count(*) AS n
            FROM s GROUP BY 1 ORDER BY guess
        """,
        "bpe_token_counts": """
            SELECT lang,
                   sum(len(regexp_split_to_array(trim(text), '\\s+'))
                       + length(regexp_replace(text, '[^.,;:!?()\\[\\]{}"'']', '', 'g'))
                       + len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                         x -> length(x) > 8)))::BIGINT AS bpe_tokens,
                   count(*) AS docs
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # real_bpe_token_counts: the SQL side reads the INDEPENDENT
        # pure-Python encoder's counts (in-rank-order scan replay of the
        # same committed merges table over the same deterministic corpus
        # formula) — the Spark side's greedy Arrow-UDF encoder must agree
        # on every document.
        "real_bpe_token_counts": f"""
            SELECT doc_id, n_tokens
            FROM read_parquet('{bpe_path}')
            ORDER BY doc_id
        """,
        "doc_rolling_fingerprint": """
            -- hash-function-independent oracle: the distribution of
            -- duplicate-group sizes is the same for any collision-free hash
            WITH fp AS (SELECT md5(regexp_replace(lower(substr(text, 1, 64)),
                                                  '\\s+', ' ', 'g')) AS f
                        FROM documents),
            g AS (SELECT f, count(*) AS n FROM fp GROUP BY f)
            SELECT n, count(*) AS groups FROM g GROUP BY n ORDER BY n
        """,
        "simhash_dup_groups": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
              FROM documents),
            hh AS (SELECT doc_id,
                          ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
                   FROM toks),
            votes AS (
              SELECT doc_id, i.i AS i,
                     sum(CASE WHEN (h >> i.i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM hh CROSS JOIN range(32) i(i)
              GROUP BY doc_id, i.i),
            sig AS (
              SELECT doc_id,
                     sum(CASE WHEN v > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS simhash
              FROM votes GROUP BY doc_id)
            SELECT simhash, count(*) AS n,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS ids
            FROM sig GROUP BY simhash HAVING count(*) > 1
            ORDER BY simhash
        """,
        "simhash_near_dup": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
              FROM documents),
            hh AS (SELECT doc_id,
                          ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
                   FROM toks),
            votes AS (
              SELECT doc_id, i.i AS i,
                     sum(CASE WHEN (h >> i.i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM hh CROSS JOIN range(32) i(i)
              GROUP BY doc_id, i.i),
            sig AS (
              SELECT doc_id,
                     sum(CASE WHEN v > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS simhash
              FROM votes GROUP BY doc_id),
            banded AS (
              SELECT doc_id, simhash, k.k AS band_id,
                     (simhash >> (k.k*8)::INT) & 255 AS key
              FROM sig CROSS JOIN range(4) k(k)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     bit_count(xor(a.simhash, b.simhash))::INT AS hamming
              FROM banded a JOIN banded b
                ON a.band_id = b.band_id AND a.key = b.key
               AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, hamming FROM cand
            WHERE hamming <= 3 ORDER BY doc_a, doc_b
        """,
        "minhash_near_dup": f"""
            WITH {_MINHASH_CTES}
            SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(src, dst) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src ORDER BY doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_MINHASH_CTES},
            shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
            sz AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
            inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
                      FROM pairs p
                      JOIN shd xa ON xa.doc_id = p.doc_a
                      JOIN shd xb ON xb.doc_id = p.doc_b AND xb.shingle = xa.shingle
                      GROUP BY p.doc_a, p.doc_b)
            SELECT i.doc_a, i.doc_b,
                   round(i.inter / (sa.sz + sb.sz - i.inter), 4) AS jaccard
            FROM inter i
            JOIN sz sa ON sa.doc_id = i.doc_a
            JOIN sz sb ON sb.doc_id = i.doc_b
            WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 4) >= 0.1
            ORDER BY doc_a, doc_b
        """,
        # 3 unrolled iterations of the identical N-scaled PageRank
        # recurrence (pipelines/graph.py): pr0=1; pr_{t+1} = 0.15 +
        # 0.85 * sum(pr_t(src)/outdeg(src)); edge set derived from the
        # SAME doc_id arithmetic (constants imported, cannot drift).
        "link_pagerank_topk": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            base AS (SELECT doc_id AS src, 1 + doc_id % 4 AS od FROM documents),
            ej AS (SELECT src, unnest(range(1, od + 1)) AS j FROM base),
            edges AS (
                SELECT src,
                       (src * {_PR_MUL} + j * {_PR_STEP}) % (SELECT n FROM nn) AS dst
                FROM ej
                WHERE (src * {_PR_MUL} + j * {_PR_STEP}) % (SELECT n FROM nn) <> src),
            outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
            ew AS (SELECT e.src, e.dst, 1.0::DOUBLE / o.od AS w
                   FROM edges e JOIN outdeg o ON o.src = e.src),
            nodes AS (SELECT doc_id AS id FROM documents),
            r0 AS (SELECT id, 1.0::DOUBLE AS pr FROM nodes),
            c1 AS (SELECT ew.dst, sum(r.pr * ew.w) AS m
                   FROM ew JOIN r0 r ON r.id = ew.src GROUP BY ew.dst),
            r1 AS (SELECT n.id,
                          0.15::DOUBLE + 0.85::DOUBLE * coalesce(c.m, 0.0::DOUBLE) AS pr
                   FROM nodes n LEFT JOIN c1 c ON c.dst = n.id),
            c2 AS (SELECT ew.dst, sum(r.pr * ew.w) AS m
                   FROM ew JOIN r1 r ON r.id = ew.src GROUP BY ew.dst),
            r2 AS (SELECT n.id,
                          0.15::DOUBLE + 0.85::DOUBLE * coalesce(c.m, 0.0::DOUBLE) AS pr
                   FROM nodes n LEFT JOIN c2 c ON c.dst = n.id),
            c3 AS (SELECT ew.dst, sum(r.pr * ew.w) AS m
                   FROM ew JOIN r2 r ON r.id = ew.src GROUP BY ew.dst),
            r3 AS (SELECT n.id,
                          0.15::DOUBLE + 0.85::DOUBLE * coalesce(c.m, 0.0::DOUBLE) AS pr
                   FROM nodes n LEFT JOIN c3 c ON c.dst = n.id)
            SELECT id AS doc_id, round(pr, 6) AS pr FROM r3
            ORDER BY round(pr, 6) DESC, id LIMIT 100
        """,
        "decontamination": f"""
            WITH {_SHINGLE_TOKS},
            sh AS (SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM toks),
            bad AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
            hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bad USING (shingle))
            SELECT d.doc_id, (h.doc_id IS NOT NULL)::INT AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "repetition_scores": f"""
            WITH {_SHINGLE_TOKS},
            sh AS (SELECT doc_id, {_SHINGLE_LIST} AS shs FROM toks),
            r AS (SELECT doc_id, len(shs) AS ct, len(list_distinct(shs)) AS cd
                  FROM sh)
            SELECT doc_id,
                   round(CASE WHEN ct <= 0 THEN 0.0::DOUBLE
                         ELSE 1.0::DOUBLE - cd::DOUBLE / ct::DOUBLE END, 4) AS rep3
            FROM r
            WHERE round(CASE WHEN ct <= 0 THEN 0.0::DOUBLE
                        ELSE 1.0::DOUBLE - cd::DOUBLE / ct::DOUBLE END, 4) > 0
            ORDER BY doc_id
        """,
        "pii_scrub_audit": f"""
            WITH inj AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id::VARCHAR
                          || '@mail.example from 10.0.'
                          || (doc_id % 256)::VARCHAR
                          || '.7 call +1 555 010 '
                          || (doc_id % 90 + 10)::VARCHAR AS t
              FROM documents),
            scrubbed AS (SELECT doc_id, {_PII_SCRUB_SQL} AS s FROM inj)
            SELECT doc_id,
                   {_PII_COUNT_SQL} AS n_pii,
                   ('0x' || substr(md5(s), 1, 15))::BIGINT AS clean_hash
            FROM scrubbed ORDER BY doc_id
        """,
        "ann_lsh_topk": f"""
            WITH sig AS (
              SELECT vec_id, embedding,
                     {_sig_sql('embedding', list(range(_LSH_TOPK_BITS)))} AS s
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, embedding AS qemb, s
                  FROM sig WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     {_cos_sql('c.embedding', 'q.qemb')} AS cos_sim
              FROM sig c JOIN q ON c.s = q.s),
            r AS (SELECT query_id, vec_id, cos_sim,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos_sim DESC, vec_id) AS rank
                  FROM scored)
            SELECT query_id, vec_id, cos_sim, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "near_dup_cross_check": f"""
            WITH {_MINHASH_CTES.strip().rstrip()}
            SELECT p.doc_a, p.doc_b,
                   {_cos_sql('a.embedding', 'b.embedding')} AS emb_cos
            FROM pairs p
            JOIN embeddings a ON a.vec_id = p.doc_a
            JOIN embeddings b ON b.vec_id = p.doc_b
            ORDER BY doc_a, doc_b
        """,
        "ann_ivf_topk": f"""
            WITH cent0 AS (
              SELECT vec_id AS cent_id,
                     list_transform(embedding, x -> x::DOUBLE) AS cvec
              FROM embeddings
              ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
              LIMIT 16),
            a0 AS (
              SELECT embedding, cent_id FROM (
                SELECT e.embedding, e.vec_id, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC,
                                    c.cent_id) AS rn
                FROM embeddings e CROSS JOIN cent0 c) WHERE rn = 1),
            cells AS (
              SELECT cent_id, count(*) AS n, {_ivf_sums_sql(_EMB_DIM)}
              FROM a0 GROUP BY cent_id),
            lloyd AS (SELECT cent_id, {_ivf_lvec_sql(_EMB_DIM)} AS lvec FROM cells),
            cent AS (
              SELECT c.cent_id, coalesce(l.lvec, c.cvec) AS cvec
              FROM cent0 c LEFT JOIN lloyd l ON l.cent_id = c.cent_id),
            assigned AS (
              SELECT vec_id, embedding, cent_id FROM (
                SELECT e.vec_id, e.embedding, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC,
                                    c.cent_id) AS rn
                FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
            probes AS (
              SELECT query_id, qemb, cent_id FROM (
                SELECT q.vec_id AS query_id, q.embedding AS qemb, c.cent_id,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY {_cos_sql('q.embedding', 'c.cvec')} DESC,
                                    c.cent_id) AS rn
                FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 3)
              WHERE rn <= 4),
            scored AS (
              SELECT p.query_id, a.vec_id,
                     {_cos_sql('a.embedding', 'p.qemb')} AS cos_sim
              FROM assigned a JOIN probes p ON a.cent_id = p.cent_id),
            r AS (SELECT query_id, vec_id, cos_sim,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos_sim DESC, vec_id) AS rank
                  FROM scored)
            SELECT query_id, vec_id, cos_sim, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "embedding_near_dup": f"""
            WITH s AS (
              SELECT vec_id, embedding,
                     {_sig_sql('embedding', list(range(0, _NEAR_DUP_BITS)))} AS s0,
                     {_sig_sql('embedding', list(range(_NEAR_DUP_BITS, 2 * _NEAR_DUP_BITS)))} AS s1
              FROM embeddings),
            b AS (SELECT vec_id, embedding, 0 AS band_id, s0 AS sig FROM s
                  UNION ALL
                  SELECT vec_id, embedding, 1 AS band_id, s1 AS sig FROM s),
            pairs AS (
              SELECT DISTINCT a.vec_id AS id_a, y.vec_id AS id_b,
                     {_cos_sql('a.embedding', 'y.embedding')} AS cos_sim
              FROM b a JOIN b y
                ON a.band_id = y.band_id AND a.sig = y.sig AND a.vec_id < y.vec_id)
            SELECT id_a, id_b, cos_sim FROM pairs
            WHERE cos_sim >= 0.35 ORDER BY id_a, id_b
        """,
        "multimodal_features": f"""
            WITH m AS (
              SELECT printf('m%05d', i) AS media_id,
                     repeat('media-' || i::VARCHAR, (4 + (i % 7))::INT) AS p
              FROM range(60) t(i)),
            h AS (SELECT media_id,
                         ('0x' || substr(md5(p), 1, 15))::BIGINT AS h
                  FROM m)
            SELECT media_id, {_multimodal_feat_sql(8)} AS feat_sum
            FROM h ORDER BY media_id
        """,
        # multimodal_real_decode: closed-form recomputation of the real
        # decode features from synth_media_docs_real's generative formulas
        # — the Spark side actually byte-parses the BMP/PPM/PNG/WAV/MP4
        # payloads (png via zlib + scanline unfiltering, mp4 via ISO-BMFF
        # box walk), so any encoder/decoder disagreement hash-fails here.
        # Every dim is quantized through FLOAT4 (the engine stores float32).
        "multimodal_real_decode": """
            WITH m AS (SELECT i, i % 5 AS fmt, printf('m%05d', i) AS media_id
                       FROM range(60) t(i)),
            imgf AS (
              SELECT media_id, 1 AS decode_ok,
                     1.0 AS g0,
                     (8 + (i%3)*4)::DOUBLE AS g1,
                     (6 + (i%4)*3)::DOUBLE AS g2,
                     (SELECT avg((7*i+y) % 256) FROM range(15) s(y) WHERE y < 6 + (i%4)*3) / 255.0 AS g3,
                     (SELECT avg((7*i+y+40) % 256) FROM range(15) s(y) WHERE y < 6 + (i%4)*3) / 255.0 AS g4,
                     (SELECT avg((7*i+y+80) % 256) FROM range(15) s(y) WHERE y < 6 + (i%4)*3) / 255.0 AS g5,
                     (8 + (i%3)*4)::DOUBLE / (6 + (i%4)*3) AS g6,
                     0.0 AS g7
              FROM m WHERE fmt IN (0, 1, 3)),
            wavf AS (
              SELECT media_id, 1 AS decode_ok,
                     2.0 AS g0,
                     (200 + (i%7)*40)::DOUBLE AS g1,
                     8.0 AS g2,
                     (SELECT sqrt(avg(((13*i + 37*y) % 4001 - 2000)::DOUBLE
                                      * ((13*i + 37*y) % 4001 - 2000)))
                      FROM range(440) s(y) WHERE y < 200 + (i%7)*40) / 2048.0 AS g3,
                     (SELECT avg(((13*i + 37*y) % 4001 - 2000)::DOUBLE)
                      FROM range(440) s(y) WHERE y < 200 + (i%7)*40) / 2048.0 AS g4,
                     (SELECT max(abs((13*i + 37*y) % 4001 - 2000))::DOUBLE
                      FROM range(440) s(y) WHERE y < 200 + (i%7)*40) / 2048.0 AS g5,
                     (200 + (i%7)*40)::DOUBLE / 8000.0 AS g6,
                     0.0 AS g7
              FROM m WHERE fmt = 2),
            vidf AS (
              SELECT media_id, 1 AS decode_ok,
                     3.0 AS g0,
                     (32 + (i%5)*16)::DOUBLE AS g1,
                     (24 + (i%3)*16)::DOUBLE AS g2,
                     (1 + i%10)::DOUBLE AS g3,
                     1.0 AS g4,
                     (50 + (i%9)*10)::DOUBLE / 1000.0 AS g5,
                     1.0 AS g6,
                     0.0 AS g7
              FROM m WHERE fmt = 4),
            u AS (SELECT * FROM imgf UNION ALL SELECT * FROM wavf
                  UNION ALL SELECT * FROM vidf)
            SELECT media_id, decode_ok,
                   round(CAST(CAST(g0 AS FLOAT) AS DOUBLE), 4) AS f0,
                   round(CAST(CAST(g1 AS FLOAT) AS DOUBLE), 4) AS f1,
                   round(CAST(CAST(g2 AS FLOAT) AS DOUBLE), 4) AS f2,
                   round(CAST(CAST(g3 AS FLOAT) AS DOUBLE), 4) AS f3,
                   round(CAST(CAST(g4 AS FLOAT) AS DOUBLE), 4) AS f4,
                   round(CAST(CAST(g5 AS FLOAT) AS DOUBLE), 4) AS f5,
                   round(CAST(CAST(g6 AS FLOAT) AS DOUBLE), 4) AS f6,
                   round(CAST(CAST(g7 AS FLOAT) AS DOUBLE), 4) AS f7
            FROM u ORDER BY media_id
        """,
        # crawl_trace_synthetic: the SQL side reads the PURE-PYTHON oracle's
        # trace (independent implementation of the reference crawl
        # semantics) — a true cross-implementation diff of the entire loop.
        "crawl_trace_synthetic": f"""
            SELECT crawl_id, batch_id, seq_in_batch, url_norm, host, depth
            FROM read_parquet('{trace_path}')
            ORDER BY batch_id, crawl_id, seq_in_batch
        """,
        # crawl_host_stats: the SQL side reads the PURE-PYTHON oracle's
        # per-(crawl, batch, host) fetch counters, accumulated inside its
        # own scheduling loop — the engine's groupBy over its fetched
        # table must agree on every requests/successes/failures/bytes
        # cell (A1, stats_middleware.py:86-98,214-239).
        "crawl_host_stats": f"""
            SELECT crawl_id, batch_id, host,
                   requests, successes, failures, bytes
            FROM read_parquet('{host_stats_path}')
            ORDER BY crawl_id, batch_id, host
        """,
        # queue_health: the SQL side reads the PURE-PYTHON oracle's
        # expected per-crawl health rows computed from ITS final frontier
        # state — equality proves the engine's purged frontier + budget
        # state match the independent implementation mid-run.
        "queue_health": f"""
            SELECT crawl_id, pages, failed, max_pages, queued,
                   retry_backlog, delayed, status
            FROM read_parquet('{health_path}')
            ORDER BY crawl_id
        """,
        # span_extraction: both sides read the same shipped span-doc corpus;
        # DuckDB recomputes every field with list/lambda SQL.
        "span_extraction": f"""
            WITH d AS (SELECT * FROM read_parquet('{span_path}')),
            x AS (
              SELECT doc_id, host, url_norm, spans,
                     (list_filter(spans, s -> s.kind = 'meta'
                                     AND starts_with(s.text, 'viewport:'))[1]).text AS vp,
                     regexp_replace((list_filter(spans, s -> s.kind = 'meta'
                                     AND starts_with(s.text, 'generator: '))[1]).text,
                                    '^generator: ', '') AS gen,
                     coalesce((list_filter(spans, s -> s.kind = 'meta'
                                     AND starts_with(s.text, 'bodyclass: '))[1]).text,
                              '') AS bc,
                     list_transform(list_filter(spans, s -> s.kind = 'style'),
                                    s -> coalesce(s.text, '')) AS styles,
                     list_transform(list_filter(spans, s -> s.kind = 'el'),
                                    s -> coalesce(s.text, '')) AS els,
                     list_transform(list_filter(spans, s -> s.kind = 'script'
                                                 AND s.media_ref IS NULL),
                                    s -> coalesce(s.text, '')) AS inljs,
                     list_transform(list_filter(spans, s -> s.kind = 'script'
                                                 AND s.media_ref IS NOT NULL
                                                 AND contains(s.media_ref, '://')
                                                 AND NOT contains(s.media_ref, host)),
                                    s -> s.media_ref) AS extrefs,
                     list_transform(list_filter(spans, s -> s.kind = 'script'
                                                 AND s.media_ref IS NOT NULL),
                                    s -> s.media_ref) AS allrefs
              FROM d),
            y AS (
              SELECT *,
                     coalesce(array_to_string(styles, ''), '') AS css0,
                     coalesce(array_to_string(styles, chr(10)), '') AS cssn,
                     coalesce(array_to_string(inljs, chr(10)), '') AS jsn,
                     ((vp IS NOT NULL AND contains(vp, 'width=device-width')
                                      AND contains(vp, 'initial-scale=1'))
                      OR len(string_split(coalesce(array_to_string(styles, ''), ''), '@media')) - 1 > 0
                     ) AS responsive,
                     (len(list_filter(els, t -> starts_with(t, 'button|')
                           AND (contains(t, 'width: 2') OR contains(t, 'height: 2'))))
                      + len(list_filter(els, t -> starts_with(t, 'a|')
                           AND (contains(t, 'padding: 0') OR contains(t, 'padding:0'))))
                      > 0) AS tap,
                     (len(list_filter(els, t -> contains(t, 'font-size: 1')
                           OR contains(t, 'font-size:1') OR contains(t, 'font-size: 0')
                           OR contains(t, 'font-size:0'))) > 0) AS smallfont,
                     (len(list_filter(els, t -> starts_with(t, 'body|')
                           AND contains(t, 'width:')))
                      + len(list_filter(els, t -> starts_with(t, 'div|')
                           AND (contains(t, 'width: 9') OR contains(t, 'width: 10')
                                OR contains(t, 'width: 11') OR contains(t, 'width: 12'))))
                      > 0) AS fixedw,
                     (len(list_filter(els, t -> starts_with(t, 'body|')
                           AND (contains(t, 'overflow-x:visible')
                                OR contains(t, 'overflow-x: visible')
                                OR contains(t, 'overflow:visible')
                                OR contains(t, 'overflow: visible')))) > 0) AS hscroll,
                     (len(list_filter(els, t -> contains(t, 'class=')
                           AND (contains(t, 'modal') OR contains(t, 'popup')
                                OR contains(t, 'overlay')
                                OR contains(t, 'interstitial')))) > 0) AS interst,
                     (len(list_filter(els, t -> (starts_with(t, 'object|')
                                                 OR starts_with(t, 'embed|'))
                           AND contains(t, 'flash'))) > 0) AS flash,
                     (contains(coalesce(array_to_string(styles, ''), ''), 'text-size-adjust: none')
                      OR contains(coalesce(array_to_string(styles, ''), ''), 'text-size-adjust:none')
                     ) AS tsadis,
                     (len(list_filter(spans, s -> s.kind = 'meta'
                           AND starts_with(s.text, 'altmobile:'))) > 0) AS sepm
              FROM x)
            SELECT doc_id,
                   (list_filter(spans, s -> s.kind = 'title')[1]).text AS title,
                   len(list_filter(spans, s -> s.kind = 'heading')) AS n_headings,
                   len(list_filter(spans, s -> s.kind = 'heading'
                                     AND starts_with(s.text, 'h1: '))) AS n_h1,
                   len(list_filter(spans, s -> s.kind = 'link')) AS n_links,
                   len(list_filter(spans, s -> s.kind = 'link'
                        AND NOT (starts_with(s.media_ref, 'mailto:') OR
                                 starts_with(s.media_ref, 'tel:') OR
                                 starts_with(s.media_ref, '#') OR
                                 starts_with(s.media_ref, 'javascript:'))
                        AND (NOT contains(s.media_ref, '://') OR
                             lower(regexp_extract(s.media_ref, '^(?i)https?://([^/]+)', 1)) = host OR
                             lower(regexp_extract(s.media_ref, '^(?i)https?://([^/]+)', 1)) = 'www.' || host OR
                             ends_with(lower(regexp_extract(s.media_ref, '^(?i)https?://([^/]+)', 1)), '.' || host))
                        )) AS n_internal,
                   len(list_filter(spans, s -> s.kind = 'link' AND
                        contains(regexp_extract(coalesce(s.text, ''), '\\|(.*)$', 1),
                                 'nofollow'))) AS n_nofollow,
                   len(list_filter(spans, s -> s.kind = 'image')) AS n_images,
                   len(list_filter(spans, s -> s.kind = 'script')) AS n_scripts,
                   coalesce(list_sum(list_transform(
                       list_filter(spans, s -> s.kind IN ('text', 'heading', 'title')
                                             AND s.text IS NOT NULL),
                       s -> len(regexp_split_to_array(s.text, '\\s+')))), 0)::BIGINT AS words,
                   coalesce(list_sum(list_transform(
                       list_filter(spans, s -> s.kind IN ('text', 'heading', 'title')
                                             AND s.text IS NOT NULL),
                       s -> len(list_filter(regexp_split_to_array(s.text, '[.!?]+'),
                                            x2 -> trim(x2) != '')))), 0)::BIGINT AS sentences,
                   len(list_filter(spans, s -> s.kind = 'meta'
                                     AND starts_with(s.text, 'og:'))) AS n_og,
                   len(list_filter(spans, s -> s.kind = 'meta'
                                     AND (starts_with(s.text, 'jsonld:')
                                          OR starts_with(s.text, 'microdata:')))) AS n_schema,
                   CASE
                     WHEN gen IS NOT NULL THEN regexp_extract(gen, '^([A-Za-z.]+)', 1)
                     WHEN len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND contains(s.media_ref, '/wp-content/'))) > 0
                       THEN 'WordPress'
                     WHEN len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND contains(s.media_ref, 'cdn.shopify.com'))) > 0
                       THEN 'Shopify'
                   END AS cms,
                   (list_sort(list_filter([{_builder_case_sql}],
                                          x2 -> x2 IS NOT NULL)))[1] AS page_builder,
                   len(list_filter(string_split(
                       regexp_replace(regexp_replace(url_norm, '^[a-z]+://[^/]*', ''),
                                      '[?#].*$', ''), '/'),
                       seg -> length(seg) > 0)) AS uri_depth,
                   greatest(0, least(100,
                     100
                     - (CASE WHEN vp IS NULL THEN 40
                             WHEN NOT responsive THEN 25 ELSE 0 END)
                     - (CASE WHEN tap THEN 15 ELSE 0 END)
                     - (CASE WHEN smallfont THEN 15 ELSE 0 END)
                     - (CASE WHEN flash THEN 20 ELSE 0 END)
                     - (CASE WHEN hscroll THEN 20 ELSE 0 END)
                     - (CASE WHEN fixedw AND NOT responsive THEN 15 ELSE 0 END)
                     - (CASE WHEN vp IS NOT NULL AND contains(vp, 'user-scalable=no')
                             THEN 10 ELSE 0 END)
                     - (CASE WHEN tsadis THEN 10 ELSE 0 END)
                     - (CASE WHEN sepm THEN 5 ELSE 0 END)
                     - (CASE WHEN interst THEN 10 ELSE 0 END)
                   )) AS mobile_score,
                   len(string_split(css0, '@media')) - 1 AS n_media_queries,
                   (CASE WHEN len(styles) > 0
                              AND len(string_split(cssn, chr(10))) <= 5
                              AND length(cssn) > 500
                         THEN 1 ELSE 0 END) AS min_css,
                   (CASE WHEN (len(inljs) > 0
                               AND len(string_split(jsn, chr(10))) <= 5
                               AND length(jsn) > 500)
                              OR len(list_filter(allrefs,
                                     r -> contains(r, '.min.js'))) > 0
                         THEN 1 ELSE 0 END) AS min_js,
                   {_tp_count_sql} AS n_providers,
                   NOT contains(coalesce(array_to_string(list_transform(
                       list_filter(spans, s -> s.kind = 'meta'
                                             AND starts_with(s.text, 'robots:')),
                       s -> s.text), ','), ''), 'noindex') AS indexable
            FROM y ORDER BY doc_id
        """,
        # multimodal_features / ann_lsh_topk / embedding_near_dup /
        # minhash_near_dup / simhash_dup_groups: fully recomputed in SQL
        # above — every queries() entry now has a DuckDB oracle.
    }
