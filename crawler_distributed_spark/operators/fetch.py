"""Fetch stage: vectorized Arrow UDF over the scheduled batch.

The reference fetches via Scrapy's downloader
(crawler/spider_project/spiders/base_spider.py:101-149); here fetch is a
``mapInPandas`` over the politeness-capped schedule. In the sandbox the
fetcher is the deterministic synthetic web (synth.py) — a pure function of
the URL, so executors need no shared state and no I/O; in production the
same operator body would issue batched HTTP requests per Arrow batch.

Serialization note: the span payload crosses the Arrow boundary as FOUR
parallel primitive arrays (kind/text/media_ref/offset) and is zipped into
the `array<struct>` column JVM-side with ``arrays_zip`` — pandas→Arrow
conversion of list<struct> is ~7× slower than list<primitive>, and this
stage is the hot loop's biggest Python surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import synth

_RAW_FIELDS = [
    T.StructField("status", T.IntegerType(), False),
    T.StructField("content_type", T.StringType(), False),
    # F6/F7 routing: 'control' = robots/sitemap fetch (never a page),
    # 'content' = everything else (page iff status 200 + accepted type)
    T.StructField("doc_class", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("outlinks", T.ArrayType(T.StringType()), False),
    T.StructField("span_kind", T.ArrayType(T.StringType()), False),
    T.StructField("span_text", T.ArrayType(T.StringType()), False),
    T.StructField("span_ref", T.ArrayType(T.StringType()), False),
    T.StructField("span_offset", T.ArrayType(T.IntegerType()), False),
    T.StructField("latency_class", T.IntegerType(), False),
    # response headers (domain_spider.py:556-571 carries
    # response_headers: map<str, list<str>>): shipped across Arrow as two
    # parallel arrays and zipped into a map JVM-side (map_from_arrays)
    T.StructField("hdr_keys", T.ArrayType(T.StringType()), False),
    T.StructField("hdr_vals", T.ArrayType(T.ArrayType(T.StringType())), False),
    # sitemap-entry metadata (S6): filled when the fetched URL is a
    # urlset sitemap (root or child) — the served XML is parsed right here
    # (functions/sitemaps); <sitemapindex> roots do NOT recurse in-task:
    # their Q4-filtered children surface via `discovered` as control
    # frontier rows, so a 10^3-child index fans out across tasks instead
    # of pinning one (deterministic substitution for the reference's
    # serial child loop, sitemap_utils.py:222-307 — see oracle.py twin)
    T.StructField("sm_url", T.ArrayType(T.StringType()), False),
    T.StructField("sm_lastmod", T.ArrayType(T.StringType()), False),
    T.StructField("sm_priority", T.ArrayType(T.DoubleType()), False),
    T.StructField("sm_changefreq", T.ArrayType(T.StringType()), False),
    # control URLs discovered by a robots.txt fetch (S5 Sitemap: scan);
    # admitted to the frontier bypassing the F1-F5 content filters
    T.StructField("discovered", T.ArrayType(T.StringType()), False),
]


def fetch_scheduled(
    scheduled: DataFrame, cfg: synth.SynthConfig, n_rows_hint: int | None = None
) -> DataFrame:
    """Append fetch-result columns (status, content_type, doc_id, outlinks,
    spans) to the scheduled batch.

    The batch is explicitly re-spread by url_hash first: AQE coalesces the
    upstream politeness windows' output by BYTE size (a few MB → 1-2
    partitions), which would serialize this CPU-bound stage — per-URL cost,
    not bytes, is what matters here. The repartition also sets the file
    count of the fetched parquet, keeping downstream admission parallel.

    ``n_rows_hint`` (an upper bound on the batch's row count, e.g. the
    eligible-frontier count) caps the partition count at ~1k rows/task so
    thin batches don't pay (shuffle.partitions − needed) empty python-worker
    spin-ups per job. Values are per-row pure, so the split never affects
    output."""
    n_part = int(scheduled.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if n_rows_hint is not None:
        n_part = max(1, min(n_part, -(-int(n_rows_hint) // 1024)))
    scheduled = scheduled.repartition(n_part, "url_hash")
    out_schema = T.StructType(list(scheduled.schema.fields) + _RAW_FIELDS)

    def do_fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.sitemaps import (
            filter_page_sitemaps,
            locate_sitemap_url,
            parse_sitemap_xml,
        )

        for pdf in batches:
            mp_col = (
                pdf["max_pages"].tolist()
                if "max_pages" in pdf.columns
                else [1 << 30] * len(pdf)
            )
            # P6: per-row fetch strategy (0=direct, 1=proxy, 2=render),
            # already max()ed from host escalation state + 403 force-proxy
            lvl_col = (
                pdf["strategy_level"].tolist()
                if "strategy_level" in pdf.columns
                else [0] * len(pdf)
            )
            n = len(pdf)
            statuses = [0] * n
            ctypes = [""] * n
            doc_class = ["content"] * n
            doc_ids: list = [None] * n
            outlinks: list = [None] * n
            kinds: list = [None] * n
            texts: list = [None] * n
            refs: list = [None] * n
            offsets: list = [None] * n
            sm_url: list = [None] * n
            sm_lastmod: list = [None] * n
            sm_prio: list = [None] * n
            sm_freq: list = [None] * n
            discovered: list = [None] * n
            lat: list = [0] * n
            hdr_keys: list = [None] * n
            hdr_vals: list = [None] * n
            for i, u in enumerate(pdf["url_norm"].tolist()):
                st = synth.status_of(cfg, u, int(lvl_col[i]))
                ct = synth.content_type_of(cfg, u)
                statuses[i] = st
                ctypes[i] = ct
                if (
                    synth.is_sitemap_url(cfg, u) is not None
                    or synth.is_child_sitemap_url(cfg, u) is not None
                    or synth.is_robots_url(cfg, u) is not None
                ):
                    doc_class[i] = "control"
                lat[i] = synth.latency_class_of(cfg, u)
                hdrs = synth.response_headers_of(cfg, u)
                hdr_keys[i] = [h[0] for h in hdrs]
                hdr_vals[i] = [h[1] for h in hdrs]
                links = synth.outlinks_of(cfg, u)
                outlinks[i] = links
                kinds[i] = []
                texts[i] = []
                refs[i] = []
                offsets[i] = []
                sm_url[i] = []
                sm_lastmod[i] = []
                sm_prio[i] = []
                sm_freq[i] = []
                discovered[i] = []
                if st == 200 and ct == "text/html":
                    doc_ids[i] = synth.doc_id_of(u)
                    spans = synth.spans_of(cfg, u, links)
                    kinds[i] = [s[0] for s in spans]
                    texts[i] = [s[1] for s in spans]
                    refs[i] = [s[2] for s in spans]
                    offsets[i] = [s[3] for s in spans]
                elif st == 200 and ct == "application/xml":
                    xml = synth.sitemap_xml_at(cfg, u)
                    if xml is not None:
                        parsed = parse_sitemap_xml(xml)
                        if parsed["is_index"]:
                            # Q4: page-class children first, 'other' after,
                            # non-page dropped — emitted as CONTROL rows
                            # (the `discovered` admission path), fetched
                            # next batch in link_idx order; capped at
                            # max_pages children (every child carries ≥1
                            # entry, the max_pages-early-break analog)
                            children, _ = filter_page_sitemaps(
                                parsed["child_sitemaps"]
                            )
                            discovered[i] = children[: mp_col[i]]
                        else:
                            entries = parsed["entries"]
                            sm_url[i] = [e["url"] for e in entries]
                            sm_lastmod[i] = [e["lastmod"] for e in entries]
                            sm_prio[i] = [e["priority"] for e in entries]
                            sm_freq[i] = [e["changefreq"] for e in entries]
                elif st == 200 and ct == "text/plain":
                    j = synth.is_robots_url(cfg, u)
                    if j is not None:
                        discovered[i] = [
                            locate_sitemap_url(
                                synth.robots_txt_of(cfg, j), synth.host_name(j)
                            )
                        ]
            pdf = pdf.copy()
            pdf["status"] = pd.array(statuses, dtype="int32")
            pdf["content_type"] = ctypes
            pdf["doc_class"] = doc_class
            pdf["doc_id"] = doc_ids
            pdf["outlinks"] = outlinks
            pdf["span_kind"] = kinds
            pdf["span_text"] = texts
            pdf["span_ref"] = refs
            pdf["span_offset"] = offsets
            pdf["sm_url"] = sm_url
            pdf["sm_lastmod"] = sm_lastmod
            pdf["sm_priority"] = sm_prio
            pdf["sm_changefreq"] = sm_freq
            pdf["latency_class"] = pd.array(lat, dtype="int32")
            pdf["hdr_keys"] = hdr_keys
            pdf["hdr_vals"] = hdr_vals
            pdf["discovered"] = discovered
            yield pdf

    raw = scheduled.mapInPandas(do_fetch, schema=out_schema)
    spans = F.arrays_zip(
        F.col("span_kind").alias("kind"),
        F.col("span_text").alias("text"),
        F.col("span_ref").alias("media_ref"),
        F.col("span_offset").alias("offset"),
    ).alias("spans")
    sitemap_entries = F.arrays_zip(
        F.col("sm_url").alias("url"),
        F.col("sm_lastmod").alias("lastmod"),
        F.col("sm_priority").alias("priority"),
        F.col("sm_changefreq").alias("changefreq"),
    ).alias("sitemap_entries")
    headers = F.map_from_arrays("hdr_keys", "hdr_vals").alias("response_headers")
    return raw.select(
        *[c for c in scheduled.columns],
        "status",
        "content_type",
        "doc_class",
        "doc_id",
        "outlinks",
        spans,
        sitemap_entries,
        headers,
        "discovered",
        "latency_class",
    )
