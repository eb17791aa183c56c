"""Per-document extraction over interleaved span arrays (SURVEY.md §2.7).

The reference runs 15 parser workers, each BeautifulSoup-parsing the same
HTML file and $set-ing one Mongo sub-document (parser/workers/*). Here the
payload is the span array (BASELINE.json input_hint), and every extraction
family is a **struct column computed by JVM higher-order functions**
(filter/transform/aggregate/exists over the spans array) — one select, no
Python, no shuffle, trivially column-prunable. A single pass computes all
families; there is nothing to fan out.

Family → reference worker mapping (docstrings cite the semantics source):
  page_title        ~ parser/workers/page_title_worker.py:45-230 (W1)
  meta_description  ~ parser/workers/meta_description_worker.py:45-96 (W2)
  headings_data     ~ parser/workers/headings_worker.py:49-413 (W3)
  directives_data   ~ parser/workers/directives_worker.py:47-461 (W5)
  images_data       ~ parser/workers/images_worker.py:49-265 (W8)
  javascript_data   ~ parser/workers/javascript_worker.py:46-497 (W9)
  links_data        ~ parser/workers/links_worker.py:47-434 (W10/L2)
  text_metrics      ~ parser/workers/page_elements_worker.py:48-461 (W12)
  uri_data          ~ parser/workers/uri_worker.py:60-511 (W18)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPANS = "spans"


def _of_kind(kind: str) -> Column:
    return F.filter(F.col(SPANS), lambda s: s["kind"] == F.lit(kind))


def _texts(col: Column) -> Column:
    return F.transform(col, lambda s: s["text"])


def _refs(col: Column) -> Column:
    return F.transform(col, lambda s: s["media_ref"])


def page_title_struct() -> Column:
    """W1: first title span text + length; robots directive from meta spans."""
    titles = _texts(_of_kind("title"))
    title = F.get(titles, 0)
    metas = _texts(_of_kind("meta"))
    robots = F.get(F.filter(metas, lambda t: t.startswith("robots:")), 0)
    return F.struct(
        title.alias("title"),
        F.coalesce(F.length(title), F.lit(0)).alias("title_length"),
        F.size(titles).alias("title_count"),
        F.regexp_replace(F.coalesce(robots, F.lit("")), "^robots: ", "").alias("robots"),
    )


def meta_description_struct() -> Column:
    """W2: first meta span that is a description (nullable)."""
    metas = _texts(_of_kind("meta"))
    desc = F.get(F.filter(metas, lambda t: t.startswith("description:")), 0)
    return F.struct(
        desc.alias("meta_description"),
        F.coalesce(F.length(desc), F.lit(0)).alias("length"),
    )


def headings_struct() -> Column:
    """W3: heading counts + text lengths min/max/avg + duplicate detection
    (headings_worker.py:167-245 level aggregation, :181-206 duplicates)."""
    hs = _texts(_of_kind("heading"))
    lens = F.transform(hs, F.length)
    n = F.size(hs)
    total = F.aggregate(lens, F.lit(0), lambda a, x: a + x)
    return F.struct(
        n.alias("count"),
        hs.alias("texts"),
        F.array_min(lens).alias("min_length"),
        F.array_max(lens).alias("max_length"),
        F.when(n > 0, F.round(total / n, 2)).alias("avg_length"),
        (n - F.size(F.array_distinct(hs))).alias("duplicate_count"),
        F.size(F.filter(hs, lambda t: F.length(t) == 0)).alias("empty_count"),
    )


def links_struct(host_col: str | None = "host") -> Column:
    """W10/L2: link span rollups — counts, unique counts, internal/external
    split against the doc's own host (links_worker.py:147-181, 256-354)."""
    links = _of_kind("link")
    refs = _refs(links)
    anchors = _texts(links)
    n = F.size(refs)
    uniq = F.size(F.array_distinct(refs))
    if host_col is not None:
        internal = F.size(
            F.filter(
                refs,
                lambda r: r.startswith(F.concat(F.lit("https://"), F.col(host_col)))
                | r.startswith(F.concat(F.lit("http://"), F.col(host_col)))
                | ~r.contains("://"),
            )
        )
    else:
        internal = F.lit(None).cast("int")
    return F.struct(
        n.alias("total"),
        uniq.alias("unique"),
        internal.alias("internal"),
        (n - internal).alias("external"),
        F.size(F.filter(anchors, lambda t: t.isNull() | (F.length(t) == 0))).alias(
            "missing_text"
        ),
    )


def images_struct() -> Column:
    """W8: image span stats (images_worker.py:253-265)."""
    imgs = _of_kind("image")
    refs = _refs(imgs)
    return F.struct(
        F.size(refs).alias("total"),
        F.size(F.array_distinct(refs)).alias("unique"),
        F.size(
            F.filter(_texts(imgs), lambda t: t.isNull() | (F.length(t) == 0))
        ).alias("missing_alt"),
    )


def directives_struct() -> Column:
    """W5: noindex/nofollow flags with implied defaults
    (directives_worker.py:205-275, 439-461)."""
    metas = _texts(_of_kind("meta"))
    robots = F.concat_ws(",", F.filter(metas, lambda t: t.startswith("robots:")))
    has_noindex = robots.contains("noindex")
    has_nofollow = robots.contains("nofollow")
    return F.struct(
        has_noindex.alias("has_noindex"),
        has_nofollow.alias("has_nofollow"),
        (~has_noindex).alias("is_indexable"),
        (~has_nofollow).alias("is_followable"),
    )


def javascript_struct() -> Column:
    """W9: script span counts + external/same-domain split
    (javascript_worker.py:46-200)."""
    scripts = _of_kind("script")
    refs = _refs(scripts)
    ext = F.filter(refs, lambda r: r.isNotNull() & r.contains("://"))
    return F.struct(
        F.size(scripts).alias("total"),
        F.size(ext).alias("external"),
        (F.size(scripts) - F.size(ext)).alias("inline"),
    )


def text_metrics_struct() -> Column:
    """W12: content metrics — words, text chars, span-mix ratio
    (page_elements_worker.py:247-335 text metrics)."""
    texty = F.filter(
        F.col(SPANS),
        lambda s: s["kind"].isin("text", "heading", "title") & s["text"].isNotNull(),
    )
    texts = _texts(texty)
    chars = F.aggregate(F.transform(texts, F.length), F.lit(0), lambda a, x: a + x)
    words = F.aggregate(
        F.transform(texts, lambda t: F.size(F.split(t, r"\s+"))),
        F.lit(0),
        lambda a, x: a + x,
    )
    n_spans = F.size(F.col(SPANS))
    return F.struct(
        words.alias("word_count"),
        chars.alias("text_chars"),
        n_spans.alias("span_count"),
        F.when(n_spans > 0, F.round(F.size(texty) / n_spans, 4)).alias("text_span_ratio"),
    )


def uri_struct(url_col: str = "url_norm") -> Column:
    """W18: URL decomposition — path segments/depth/extension/format flags,
    query-param classification (uri_worker.py:60-511)."""
    url = F.col(url_col)
    path = F.regexp_replace(
        F.regexp_replace(url, r"^[a-z]+://[^/]*", ""), r"[?#].*$", ""
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: F.length(s) > 0)
    ext = F.regexp_extract(path, r"\.([a-zA-Z0-9]+)$", 1)
    params = F.filter(F.split(query, "&"), lambda s: F.length(s) > 0)
    param_keys = F.transform(params, lambda p: F.split(p, "=")[0])
    tracking = F.size(
        F.filter(
            param_keys,
            lambda k: k.startswith("utm_")
            | k.isin("fbclid", "gclid", "ref", "sid", "session_id"),
        )
    )
    return F.struct(
        path.alias("path"),
        F.size(segs).alias("depth"),
        segs.alias("segments"),
        ext.alias("extension"),
        (F.length(query) > 0).alias("has_query"),
        F.size(params).alias("param_count"),
        tracking.alias("tracking_param_count"),
        path.rlike("[A-Z]").alias("has_uppercase"),
        path.contains("_").alias("has_underscores"),
    )


def canonical_struct(url_col: str = "url_norm") -> Column:
    """W4: canonical link + self-canonical check + noindex conflict
    (canonical_worker.py:47-268; self-check :205-234)."""
    metas = _texts(_of_kind("meta"))
    canon = F.filter(metas, lambda t: t.startswith("canonical:"))
    href = F.regexp_replace(F.get(canon, 0), "^canonical: ", "")
    robots = F.concat_ws(",", F.filter(metas, lambda t: t.startswith("robots:")))
    return F.struct(
        href.alias("canonical_url"),
        F.size(canon).alias("canonical_count"),
        (href == F.col(url_col)).alias("is_self_canonical"),
        (href.isNotNull() & robots.contains("noindex")).alias("noindex_conflict"),
    )


def ga_analytics_struct() -> Column:
    """W6: GA/GTM detection + measurement-id extraction from script refs
    (google_analytics_worker.py:31-190; UA-/G-/GTM- id patterns)."""
    refs = _refs(_of_kind("script"))
    ga_refs = F.filter(
        refs,
        lambda r: r.isNotNull()
        & (r.contains("googletagmanager.com") | r.contains("google-analytics.com")),
    )
    ids = F.array_distinct(
        F.filter(
            F.transform(
                ga_refs, lambda r: F.regexp_extract(r, r"[?&]id=((UA|G|GTM)-[A-Za-z0-9-]+)", 1)
            ),
            lambda x: F.length(x) > 0,
        )
    )
    return F.struct(
        (F.size(ga_refs) > 0).alias("has_analytics"),
        ids.alias("measurement_ids"),
        F.size(ids).alias("id_count"),
    )


def hreflang_struct(url_col: str = "url_norm") -> Column:
    """W7: hreflang alternates — lang codes, validity, self-reference
    (hreflang_worker.py:51-383; lang-code regex validation)."""
    metas = _texts(_of_kind("meta"))
    hl = F.filter(metas, lambda t: t.startswith("hreflang:"))
    entries = F.transform(
        hl,
        lambda t: F.struct(
            F.regexp_extract(t, r"^hreflang: (\S+) ", 1).alias("lang"),
            F.regexp_extract(t, r"^hreflang: \S+ (.*)$", 1).alias("href"),
        ),
    )
    langs = F.array_distinct(F.transform(entries, lambda e: e["lang"]))
    valid = F.filter(
        langs, lambda code: code.rlike("^[a-z]{2}(-[a-z]{2})?$")
    )
    self_ref = F.exists(
        entries, lambda e: e["href"].startswith(F.col(url_col))
    )
    return F.struct(
        F.size(entries).alias("count"),
        langs.alias("langs"),
        (F.size(langs) - F.size(valid)).alias("invalid_lang_count"),
        self_ref.alias("has_self_reference"),
        F.array_contains(
            F.transform(entries, lambda e: e["lang"]), "x-default"
        ).alias("has_x_default"),
    )


def mobile_struct() -> Column:
    """W11: viewport parse + mobile-friendliness verdict
    (mobile_worker.py:49-413; score → likely/possibly/unlikely)."""
    metas = _texts(_of_kind("meta"))
    vp = F.get(F.filter(metas, lambda t: t.startswith("viewport:")), 0)
    has_vp = vp.isNotNull()
    responsive = has_vp & vp.contains("width=device-width")
    initial_scale = has_vp & vp.contains("initial-scale=1")
    verdict = (
        F.when(responsive & initial_scale, F.lit("likely"))
        .when(has_vp, F.lit("possibly"))
        .otherwise(F.lit("unlikely"))
    )
    return F.struct(
        has_vp.alias("has_viewport"),
        responsive.alias("responsive_width"),
        initial_scale.alias("has_initial_scale"),
        verdict.alias("mobile_friendly"),
    )


def structured_data_struct() -> Column:
    """W14: structured-data type flags + schema count
    (structured_worker.py:48-453; has_<type> flags over JSON-LD types)."""
    metas = _texts(_of_kind("meta"))
    sd = F.transform(
        F.filter(metas, lambda t: t.startswith("jsonld:")),
        lambda t: F.regexp_replace(t, "^jsonld: ", ""),
    )
    types = F.array_distinct(sd)
    return F.struct(
        F.size(sd).alias("schema_count"),
        types.alias("types"),
        F.array_contains(types, "Article").alias("has_article"),
        F.array_contains(types, "Product").alias("has_product"),
        F.array_contains(types, "FAQPage").alias("has_faq"),
    )


def third_party_struct(host_col: str = "host") -> Column:
    """W15: third-party service detection — external script refs grouped
    by provider domain (third_party_services_worker.py:44-802 signature
    sets, reduced to ref-domain classification over spans)."""
    refs = _refs(_of_kind("script"))
    ext = F.filter(
        refs,
        lambda r: r.isNotNull()
        & r.contains("://")
        & ~r.contains(F.col(host_col)),
    )
    domains = F.array_distinct(
        F.transform(ext, lambda r: F.regexp_extract(r, r"^https?://([^/]+)", 1))
    )
    return F.struct(
        F.size(ext).alias("third_party_scripts"),
        domains.alias("provider_domains"),
        F.exists(domains, lambda d: d.contains("googletagmanager")).alias(
            "has_tag_manager"
        ),
    )


def pagespeed_struct() -> Column:
    """W13: resource inventory — script/image/media counts, third-party
    share, render-blocking proxy (pagespeed_worker.py:46-535 reduced to
    the span-visible resource surface)."""
    scripts = _of_kind("script")
    images = _of_kind("image")
    videos = _of_kind("video")
    n_res = F.size(scripts) + F.size(images) + F.size(videos)
    ext_scripts = F.filter(
        _refs(scripts), lambda r: r.isNotNull() & r.contains("://")
    )
    return F.struct(
        n_res.alias("resource_count"),
        F.size(scripts).alias("scripts"),
        F.size(images).alias("images"),
        F.size(videos).alias("videos"),
        F.size(ext_scripts).alias("external_scripts"),
        (F.size(scripts) > 5).alias("many_scripts"),
    )


ALL_FAMILIES = {
    "page_title": page_title_struct,
    "meta_description": meta_description_struct,
    "headings_data": headings_struct,
    "links_data": links_struct,
    "images_data": images_struct,
    "directives_data": directives_struct,
    "javascript_data": javascript_struct,
    "text_metrics": text_metrics_struct,
    "uri_data": uri_struct,
    "canonical_data": canonical_struct,
    "ga_analytics": ga_analytics_struct,
    "hreflang_data": hreflang_struct,
    "mobile_data": mobile_struct,
    "structured_data": structured_data_struct,
    "third_party_services": third_party_struct,
    "pagespeed_data": pagespeed_struct,
}


def parse_docs(docs: DataFrame, families: list[str] | None = None) -> DataFrame:
    """Compute all extraction families in ONE select over the docs table.

    ``docs`` needs columns: doc_id, spans; plus host (for links_data) and
    url_norm (for uri_data) when those families are requested. This is the
    engine's replacement for the reference's 15-way parse-job fan-out
    (parser/dispatch/job_dispatcher.py:24-152): same outputs, one pass,
    column-pruned, no queue."""
    names = families or list(ALL_FAMILIES)
    needs_url = {"uri_data", "canonical_data", "hreflang_data"}
    needs_host = {"third_party_services"}
    cols = [docs["*"]]
    for name in names:
        fn = ALL_FAMILIES[name]
        if name == "links_data":
            cols.append(fn("host" if "host" in docs.columns else None).alias(name))
        elif name in needs_url:
            if "url_norm" not in docs.columns:
                continue
            cols.append(fn("url_norm").alias(name))
        elif name in needs_host:
            if "host" not in docs.columns:
                continue
            cols.append(fn("host").alias(name))
        else:
            cols.append(fn().alias(name))
    return docs.select(*cols)
