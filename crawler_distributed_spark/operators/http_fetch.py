"""Production fetch body: batched real HTTP over the scheduled batch.

Same operator shape as operators/fetch.py (the deterministic synthetic
fetcher): an Arrow ``mapInPandas`` over the politeness-capped schedule,
emitting the identical _RAW_FIELDS schema — so `run_crawl(fetcher=...)`
swaps transports without touching politeness, admission, the seen set,
checkpointing, or extraction. The body is stdlib ``urllib.request`` with
a bounded thread pool per Arrow batch. Politeness caps the per-host
COUNT per batch (quota); concurrency discipline is enforced HERE by
grouping each Arrow batch's URLs by host and fetching one host's URLs
sequentially in a single pool slot — the pool overlaps only ACROSS
hosts, so a host never sees more than one in-flight request from this
task. Stands in for the reference's Scrapy downloader
(crawler/spider_project/spiders/base_spider.py:101-149,
CONCURRENT_REQUESTS_PER_DOMAIN=1 discipline).

Redirects are NOT followed at the transport (``_NO_REDIRECTS`` handler
on ``_opener``): a 3xx surfaces as its real status row with the
resolved ``Location`` as the single outlink, matching the synthetic
fetcher's 301 contract — the LOOP owns redirect admission (same-depth
re-enqueue through the seen set / scoping filters), so doc_id and the
seen set record the pre-redirect URL and the target is admitted like
any discovered link rather than silently substituted.

Routing parity with the synthetic fetcher:
- robots.txt URLs   → control rows; `Sitemap:` scan feeds `discovered`
  (functions/sitemaps.locate_sitemap_url — the real scanner, shared).
- XML sitemaps      → control rows; functions/sitemaps.parse_sitemap_xml
  (the real parser, shared) fills sitemap_entries / index fan-out.
- HTML pages        → functions/html_spans.html_to_spans turns the real
  DOM into the span grammar extract/spans.py consumes.
- latency_class     → elapsed-time bucket (autothrottle P2 input).
  NOTE: real latency makes autothrottle state — and therefore batch
  composition — timing-dependent; that is inherent to live crawling.
  The determinism/trace-equality contract is owned by the synthetic
  fetcher; budgets that don't bind (max_pages ≥ site size) keep the
  final seen set transport-independent, which is what the integration
  test asserts.

Strategy levels (P6): level 0 fetches direct; levels 1-2 (proxy/render)
are transport concerns — install handlers on `_opener` (ProxyHandler /
a render service) to honor them; the level is threaded through so the
escalation plumbing is exercised end-to-end either way.
"""

from __future__ import annotations

import re
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.html_spans import html_to_spans
from ..functions.sitemaps import (
    filter_page_sitemaps,
    locate_sitemap_url,
    parse_sitemap_xml,
)
from ..synth import doc_id_of
from .fetch import _RAW_FIELDS

_SITEMAP_PATH = re.compile(r"/[^/]*sitemap[^/]*\.xml$", re.I)


class _NoRedirects(urllib.request.HTTPRedirectHandler):
    """Surface 3xx as HTTPError rows instead of silently following —
    the loop owns redirect admission (policy.REDIRECT_STATUSES)."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


# transport hook point: strategy levels 1-2 install ProxyHandler /
# renderer handlers here (module docstring). Redirects never follow.
_opener = urllib.request.build_opener(_NoRedirects())

# latency buckets (ms) → autothrottle class 0..3, mirroring the
# synthetic fetcher's 4-class domain
_LAT_EDGES = (100, 300, 1000)


def _latency_class(elapsed_ms: float) -> int:
    for c, edge in enumerate(_LAT_EDGES):
        if elapsed_ms < edge:
            return c
    return 3


def _classify(url: str) -> str:
    path = url.split("://", 1)[-1].split("/", 1)
    path = "/" + path[1] if len(path) > 1 else "/"
    if path == "/robots.txt" or _SITEMAP_PATH.search(path):
        return "control"
    return "content"


def fetch_url(url: str, timeout: float = 10.0, user_agent: str | None = None):
    """One GET → dict(status, content_type, body, headers, elapsed_ms,
    location). Never raises: transport errors become status 0
    (retryable class), HTTP errors keep their real status. Redirects do
    NOT follow (``_NoRedirects``): a 3xx row carries its resolved
    Location target so the loop admits it. Body is decoded text for
    text/xml types, None otherwise (binary payloads flow through the
    multimodal pipeline, not the span parser)."""
    import time
    import urllib.error

    req = urllib.request.Request(
        url, headers={"User-Agent": user_agent or "crawler-spark/1.0"}
    )
    t0 = time.monotonic()
    status, ctype, body, headers, location = 0, "", None, [], None
    try:
        with _opener.open(req, timeout=timeout) as resp:
            status = resp.status
            raw_headers = resp.getheaders()
            ctype = (resp.headers.get("Content-Type") or "").split(";")[0].strip()
            if ctype in ("text/html", "application/xml", "text/xml", "text/plain"):
                body = resp.read().decode(
                    resp.headers.get_content_charset() or "utf-8", errors="replace"
                )
            else:
                resp.read()  # drain; binary handled elsewhere
            hk: dict[str, list[str]] = {}
            for k, v in raw_headers:
                hk.setdefault(k.lower(), []).append(v)
            headers = sorted(hk.items())
    except urllib.error.HTTPError as e:
        status = e.code
        ctype = (e.headers.get("Content-Type") or "").split(";")[0].strip()
        loc = e.headers.get("Location")
        if 300 <= e.code < 400 and loc:
            location = urljoin(url, loc)
        headers = sorted(
            {k.lower(): [v] for k, v in (e.headers.items() or [])}.items()
        )
    except Exception:
        status = 0  # DNS/conn/timeout — retry policy's network class
    elapsed_ms = (time.monotonic() - t0) * 1000.0
    if ctype == "text/xml":
        ctype = "application/xml"  # F6 normalization
    return {
        "status": status,
        "content_type": ctype,
        "body": body,
        "headers": headers,
        "elapsed_ms": elapsed_ms,
        "location": location,
    }


def fetch_scheduled_http(
    scheduled: DataFrame,
    n_rows_hint: int | None = None,
    timeout: float = 10.0,
    threads_per_task: int = 8,
) -> DataFrame:
    """Real-HTTP twin of operators/fetch.fetch_scheduled: same explicit
    url_hash re-spread (I/O-bound here, but the partition count still
    sets downstream parquet parallelism), same output schema."""
    from pyspark.sql import functions as F

    n_part = int(scheduled.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if n_rows_hint is not None:
        n_part = max(1, min(n_part, -(-int(n_rows_hint) // 1024)))
    scheduled = scheduled.repartition(n_part, "url_hash")
    out_schema = T.StructType(list(scheduled.schema.fields) + _RAW_FIELDS)

    def do_fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = pdf["url_norm"].tolist()
            mp_col = (
                pdf["max_pages"].tolist()
                if "max_pages" in pdf.columns
                else [1 << 30] * len(pdf)
            )
            n = len(pdf)
            # per-host politeness: one pool slot per host, each host's
            # URLs fetched sequentially — overlap only ACROSS hosts
            by_host: dict[str, list[int]] = {}
            for i, u in enumerate(urls):
                by_host.setdefault(u.split("/")[2], []).append(i)

            def fetch_host(idxs: list[int]) -> list[tuple[int, dict]]:
                return [(i, fetch_url(urls[i], timeout=timeout)) for i in idxs]

            results: list[dict] = [None] * n  # type: ignore[list-item]
            with ThreadPoolExecutor(
                max_workers=min(threads_per_task, max(len(by_host), 1))
            ) as ex:
                for chunk in ex.map(fetch_host, by_host.values()):
                    for i, r in chunk:
                        results[i] = r
            cols: dict[str, list] = {
                k: [None] * n
                for k in (
                    "doc_id outlinks span_kind span_text span_ref span_offset "
                    "sm_url sm_lastmod sm_priority sm_changefreq discovered "
                    "hdr_keys hdr_vals"
                ).split()
            }
            statuses, ctypes, classes, lat = [], [], [], []
            for i, (u, r) in enumerate(zip(urls, results)):
                statuses.append(r["status"])
                ctypes.append(r["content_type"])
                classes.append(_classify(u))
                lat.append(_latency_class(r["elapsed_ms"]))
                cols["hdr_keys"][i] = [k for k, _ in r["headers"]]
                cols["hdr_vals"][i] = [v for _, v in r["headers"]]
                for k in ("outlinks", "span_kind", "span_text", "span_ref",
                          "span_offset", "sm_url", "sm_lastmod", "sm_priority",
                          "sm_changefreq", "discovered"):
                    cols[k][i] = []
                body = r["body"]
                if r.get("location"):
                    # 3xx: resolved Location as the single outlink — the
                    # loop's redirect path admits it at the same depth
                    cols["outlinks"][i] = [r["location"]]
                    continue
                if r["status"] != 200 or body is None:
                    continue
                host = u.split("/")[2]
                if r["content_type"] == "text/html" and classes[i] == "content":
                    spans, links = html_to_spans(body, u)
                    cols["doc_id"][i] = doc_id_of(u)
                    cols["outlinks"][i] = links
                    cols["span_kind"][i] = [s[0] for s in spans]
                    cols["span_text"][i] = [s[1] for s in spans]
                    cols["span_ref"][i] = [s[2] for s in spans]
                    cols["span_offset"][i] = [s[3] for s in spans]
                elif r["content_type"] == "application/xml":
                    parsed = parse_sitemap_xml(body)
                    if parsed["is_index"]:
                        children, _ = filter_page_sitemaps(parsed["child_sitemaps"])
                        cols["discovered"][i] = children[: mp_col[i]]
                    else:
                        es = parsed["entries"]
                        cols["sm_url"][i] = [e["url"] for e in es]
                        cols["sm_lastmod"][i] = [e["lastmod"] for e in es]
                        cols["sm_priority"][i] = [e["priority"] for e in es]
                        cols["sm_changefreq"][i] = [e["changefreq"] for e in es]
                elif r["content_type"] == "text/plain" and u.endswith("/robots.txt"):
                    cols["discovered"][i] = [locate_sitemap_url(body, host)]
            pdf = pdf.copy()
            pdf["status"] = pd.array(statuses, dtype="int32")
            pdf["content_type"] = ctypes
            pdf["doc_class"] = classes
            pdf["doc_id"] = cols["doc_id"]
            pdf["outlinks"] = cols["outlinks"]
            pdf["span_kind"] = cols["span_kind"]
            pdf["span_text"] = cols["span_text"]
            pdf["span_ref"] = cols["span_ref"]
            pdf["span_offset"] = cols["span_offset"]
            pdf["sm_url"] = cols["sm_url"]
            pdf["sm_lastmod"] = cols["sm_lastmod"]
            pdf["sm_priority"] = cols["sm_priority"]
            pdf["sm_changefreq"] = cols["sm_changefreq"]
            pdf["latency_class"] = pd.array(lat, dtype="int32")
            pdf["hdr_keys"] = cols["hdr_keys"]
            pdf["hdr_vals"] = cols["hdr_vals"]
            pdf["discovered"] = cols["discovered"]
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
