"""Real-HTTP production fetch path: html→span-grammar parser, the
urllib batch fetcher against a local http.server, and the full crawl
loop driven over a live localhost site (politeness + robots + seen-set
+ checkpointing, transport swapped via run_crawl(fetcher=...))."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler_distributed_spark.functions.html_spans import html_to_spans
from crawler_distributed_spark.operators.http_fetch import (
    fetch_scheduled_http,
    fetch_url,
)

# ---------------------------------------------------------------------------
# the deterministic localhost site
# ---------------------------------------------------------------------------

_PAGE_A = """<!doctype html>
<html><head>
<title>Alpha  Page</title>
<meta name="description" content="first real page">
<meta name="robots" content="index,follow">
<meta property="og:title" content="alpha">
<link rel="canonical" href="/a.html">
<link rel="alternate" hreflang="de-de" href="/a.html?hl=de">
<script src="/js/app.js" defer></script>
<script>window.dataLayer = window.dataLayer || []; function gtag(){}</script>
<style>.c0 { color: #111; }</style>
</head>
<body class="bootstrap container-fluid">
<h1>Welcome Here</h1>
<p>Some body text for quality scoring.</p>
<a href="/b.html" rel="nofollow">to bee</a>
<a href="/private/secret.html">hidden</a>
<a href="mailto:x@y.z">mail</a>
<img src="/img/1.png" width="640" height="480" alt="pic">
<script type="application/ld+json">{"@type": "Article", "name": "x"}</script>
</body></html>"""

_PAGE_B = """<html><head><title>Beta</title></head>
<body><h2>Section Two</h2><a href="/a.html">back</a>
<a href="/moved.html">old location</a>
<a href="http://other.example/x">offsite</a></body></html>"""

_PAGE_C = "<html><head><title>Gamma</title></head><body><p>landed</p></body></html>"

_PAGE_PRIVATE = "<html><head><title>secret</title></head><body>no</body></html>"

_ROBOTS = "User-agent: *\nDisallow: /private/\nSitemap: {base}/sitemap.xml\n"

_SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>{base}/a.html</loc><lastmod>2024-01-02</lastmod>
<priority>0.8</priority><changefreq>daily</changefreq></url>
<url><loc>{base}/b.html</loc></url>
</urlset>"""


class _Handler(BaseHTTPRequestHandler):
    site: dict = {}

    def do_GET(self):
        entry = self.site.get(self.path)
        if entry is None:
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html><body>gone</body></html>")
            return
        body, ctype = entry
        if ctype == "redirect":
            self.send_response(301)
            self.send_header("Location", body)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def site():
    # port 80 so site URLs carry no port: F3 validity mirrors the
    # reference's is_valid_url regex (url_utils.py:316-337), which
    # accepts no port suffix — a :PORT URL would be filtered at
    # admission exactly as the reference would filter it.
    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 80), _Handler)
    except (PermissionError, OSError):
        pytest.skip("cannot bind 127.0.0.1:80 for the portless-URL site")
    base = "http://127.0.0.1"
    _Handler.site = {
        "/": (
            f'<html><head><title>Home</title></head><body>'
            f'<a href="/a.html">a</a> <a href="/b.html">b</a></body></html>',
            "text/html; charset=utf-8",
        ),
        "/a.html": (_PAGE_A, "text/html; charset=utf-8"),
        "/b.html": (_PAGE_B, "text/html"),
        "/c.html": (_PAGE_C, "text/html"),
        "/moved.html": ("/c.html", "redirect"),
        "/private/secret.html": (_PAGE_PRIVATE, "text/html"),
        "/robots.txt": (_ROBOTS.format(base=base), "text/plain"),
        "/sitemap.xml": (_SITEMAP.format(base=base), "application/xml"),
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield base
    srv.shutdown()


# ---------------------------------------------------------------------------
# html → span grammar
# ---------------------------------------------------------------------------


def test_html_to_spans_grammar():
    spans, links = html_to_spans(_PAGE_A, "http://h.example/a.html")
    by_kind = {}
    for k, text, ref, off in spans:
        by_kind.setdefault(k, []).append((text, ref))
    assert by_kind["title"] == [("Alpha Page", None)]
    metas = dict(t.split(": ", 1) for t, _ in by_kind["meta"])
    assert metas["description"] == "first real page"
    assert metas["robots"] == "index,follow"
    assert metas["og:title"] == "alpha"
    assert metas["canonical"] == "http://h.example/a.html"
    assert metas["hreflang"] == "de-de http://h.example/a.html?hl=de"
    assert metas["jsonld"] == "Article"
    assert metas["bodyclass"] == "bootstrap container-fluid"
    assert by_kind["heading"] == [("h1: Welcome Here", None)]
    # scripts: external src with defer csv, inline body with the W15 sig
    ext = [(t, r) for t, r in by_kind["script"] if r is not None]
    inl = [(t, r) for t, r in by_kind["script"] if r is None]
    assert ext == [("defer", "http://h.example/js/app.js")]
    assert "window.dataLayer" in inl[0][0]
    assert by_kind["style"] == [(".c0 { color: #111; }", None)]
    # links: rel attrs encoded, mailto kept as span but not as outlink
    link_texts = {t for t, _ in by_kind["link"]}
    assert "to bee|nofollow" in link_texts
    assert links == [
        "http://h.example/b.html",
        "http://h.example/private/secret.html",
    ]
    assert by_kind["image"] == [("pic", "http://h.example/img/1.png?w=640&h=480")]
    # offsets strictly increasing (the input_hint ordering contract)
    offs = [s[3] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_html_to_spans_nested_and_unclosed():
    # ADVICE r4: nested <a> must not clobber the heading's text; an
    # unclosed <a> must still emit its link and must not swallow the
    # rest of the document
    html = (
        '<html><body><h1>Hello <a href="/w.html">world</a>!</h1>'
        '<a href="/dangling.html">dangle'
        "<p>tail text must survive</p></body></html>"
    )
    spans, links = html_to_spans(html, "http://h.example/")
    by_kind = {}
    for k, text, ref, off in spans:
        by_kind.setdefault(k, []).append((text, ref))
    assert by_kind["heading"] == [("h1: Hello world!", None)]
    assert ("world", "http://h.example/w.html") in by_kind["link"]
    assert ("dangle", "http://h.example/dangling.html") in by_kind["link"]
    assert links == ["http://h.example/w.html", "http://h.example/dangling.html"]
    assert any("tail text must survive" in (t or "") for t, _ in by_kind["text"])
    offs = [s[3] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_html_to_spans_dangling_at_eof():
    # capture still open at EOF drains at close() instead of vanishing
    spans, links = html_to_spans(
        '<html><body><a href="/x.html">never closed', "http://h.example/"
    )
    assert links == ["http://h.example/x.html"]
    assert [(s[1], s[2]) for s in spans if s[0] == "link"] == [
        ("never closed", "http://h.example/x.html")
    ]


def test_fetch_url_statuses(site):
    ok = fetch_url(f"{site}/a.html")
    assert ok["status"] == 200 and ok["content_type"] == "text/html"
    assert "Alpha" in ok["body"]
    assert any(k == "content-type" for k, _ in ok["headers"])
    assert fetch_url(f"{site}/nope.html")["status"] == 404
    # redirects surface as status rows with the resolved target — the
    # transport never silently follows (ADVICE r4)
    moved = fetch_url(f"{site}/moved.html")
    assert moved["status"] == 301
    assert moved["location"] == f"{site}/c.html"
    # closed port → transport error class, never an exception
    assert fetch_url("http://127.0.0.1:9/x", timeout=0.5)["status"] == 0
    xml = fetch_url(f"{site}/sitemap.xml")
    assert xml["content_type"] == "application/xml"


def test_fetch_scheduled_http_operator(spark, site):
    sched = spark.createDataFrame(
        [
            (f"{site}/a.html", 1, "127.0.0.1", "c-0"),
            (f"{site}/robots.txt", 2, "127.0.0.1", "c-0"),
            (f"{site}/sitemap.xml", 3, "127.0.0.1", "c-0"),
            (f"{site}/nope.html", 4, "127.0.0.1", "c-0"),
        ],
        "url_norm string, url_hash long, host string, crawl_id string",
    )
    rows = {r.url_norm: r for r in fetch_scheduled_http(sched).collect()}
    a = rows[f"{site}/a.html"]
    assert a.status == 200 and a.doc_class == "content"
    kinds = [s.kind for s in a.spans]
    assert "title" in kinds and "heading" in kinds and "link" in kinds
    assert f"{site}/b.html" in a.outlinks
    assert a.doc_id is not None
    rb = rows[f"{site}/robots.txt"]
    assert rb.doc_class == "control"
    assert rb.discovered == [f"{site}/sitemap.xml"]  # Sitemap: scan (S5)
    sm = rows[f"{site}/sitemap.xml"]
    assert sm.doc_class == "control"
    assert [e.url for e in sm.sitemap_entries] == [
        f"{site}/a.html",
        f"{site}/b.html",
    ]
    assert sm.sitemap_entries[0].priority == 0.8
    assert rows[f"{site}/nope.html"].status == 404


def test_http_crawl_end_to_end(spark, site, tmp_path):
    """The flagship loop crawls a real localhost site: seed → fetch →
    span parse → outlink admission → robots gate → seen-set → budget,
    all through the standard checkpointed batch machinery with only the
    transport swapped."""
    from crawler_distributed_spark import synth
    from crawler_distributed_spark.plans.frontier_loop import run_crawl
    from crawler_distributed_spark.policy import CrawlPolicy

    from crawler_distributed_spark.functions.sitemaps import robots_rules_from_txt

    host = site.split("://", 1)[1]
    seeds = [
        {
            "crawl_id": "crawl-http",
            "domain": host,
            "url": f"{site}/",
            "max_pages": 50,
            "single_url": False,
            "use_sitemap": False,
            "priority": 0,
            "project_id": "t",
        }
    ]
    # gating rules come from the site's REAL robots.txt, not hand-wired
    rows = robots_rules_from_txt(fetch_url(f"{site}/robots.txt")["body"], host)
    assert {"host": host, "path_prefix": "/private/", "allow": False} in rows
    robots = spark.createDataFrame(rows)
    res = run_crawl(
        spark,
        synth.SynthConfig(n_hosts=1),
        seeds,
        robots,
        str(tmp_path / "ck"),
        CrawlPolicy(quota_per_host=4, checkpoint_every=2),
        fetcher=fetch_scheduled_http,
    )
    fetched = res._fetched(spark)
    got = {r.url_norm: r for r in fetched.collect()}
    # all public pages crawled exactly once; the robots-blocked
    # /private/ page was linked from /a.html but never fetched
    assert f"{site}/" in got and f"{site}/a.html" in got and f"{site}/b.html" in got
    assert f"{site}/private/secret.html" not in got
    # /moved.html surfaced as a REAL 301 row (transport never follows);
    # the loop admitted its Location target /c.html at the same depth
    mv = got[f"{site}/moved.html"]
    assert mv.status == 301 and mv.outlinks == [f"{site}/c.html"]
    assert got[f"{site}/c.html"].status == 200
    pages = [u for u in got if got[u].doc_class == "content" and got[u].status == 200]
    assert len(pages) == 4  # /, a, b, c — the 301 row is not a page
    # real spans flowed through: /a.html carries its parsed grammar
    a = got[f"{site}/a.html"]
    assert ("title", "Alpha Page") in [(s.kind, s.text) for s in a.spans]
    # offsite link was scoped out by F4
    assert "http://other.example/x" not in got
    # budget accounting saw exactly the 3 content pages
    assert res.pages_dict(spark)["crawl-http"] == 4
    # the W-extraction families run unchanged on the REAL crawled spans:
    # one parse_docs select over the loop's own fetched table
    from crawler_distributed_spark.extract.spans import parse_docs

    pages = fetched.where(
        (F.col("doc_class") == "content") & (F.col("status") == 200)
    ).select("doc_id", "url_norm", "host", "spans", "response_headers")
    w = {r.url_norm: r for r in parse_docs(pages).collect()}
    a = w[f"{site}/a.html"]
    assert a.page_title.title == "Alpha Page"
    assert a.headings_data.h1 == 1
    assert a.links_data.nofollow == 1
    assert a.images_data.total == 1
    # W15 inline-JS signature ('window.dataLayer' / 'gtag(') detected in
    # the real inline script body; CSS framework from the real bodyclass
    assert "google_analytics" in a.third_party_services.providers
    assert "bootstrap" in a.third_party_services.css_frameworks
    assert a.structured_data.has_article  # real JSON-LD @type=Article


def test_robots_rules_from_txt_groups_and_wildcards():
    from crawler_distributed_spark.functions.sitemaps import robots_rules_from_txt

    txt = """# comment
User-agent: Googlebot
Disallow: /google-only/

User-agent: *
User-agent: other-bot
Disallow: /private/
Allow: /private/open/
Allow: /pub*lic
Disallow: /tmp*junk
Disallow: /admin*
Disallow: /*.php
Disallow: *leading
Disallow:

User-agent: BadBot
Disallow: /
"""
    rows = robots_rules_from_txt(txt, "h.example")
    got = {(r["path_prefix"], r["allow"]) for r in rows}
    # our group ('*') rules present; wildcard handling conservative
    # toward allowing: trailing-* dropped (prefix no-op), mid-* Allow
    # truncated (widening an Allow is safe), mid-*/leading-* Disallow
    # SKIPPED — truncating '/*.php' to '/' would block the whole host
    assert ("/private/", False) in got
    assert ("/private/open/", True) in got
    assert ("/pub", True) in got  # Allow truncated at '*'
    assert ("/admin", False) in got  # trailing-* Disallow kept as prefix
    assert not any("tmp" in p for p, _ in got)  # mid-* Disallow skipped
    assert ("/google-only/", False) not in got
    assert ("/", True) in got  # default allow appended (no '/' Disallow row)
    assert not any(p.startswith("*") or "leading" in p for p, _ in got)
    # a '*' group that disallows '/' must NOT get the default-allow row
    rows2 = robots_rules_from_txt("User-agent: *\nDisallow: /", "h.example")
    assert {(r["path_prefix"], r["allow"]) for r in rows2} == {("/", False)}
