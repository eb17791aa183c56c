"""Per-document extraction over interleaved span arrays (SURVEY.md §2.7).

The reference runs 15 parser workers, each BeautifulSoup-parsing the same
HTML file and $set-ing one Mongo sub-document (parser/workers/*). Here the
payload is the span array (BASELINE.json input_hint), and every extraction
family is a **struct column computed by JVM higher-order functions**
(filter/transform/aggregate/exists over the spans array) — one select, no
Python, no shuffle, trivially column-prunable. A single pass computes all
families; there is nothing to fan out.

HTML attributes are encoded in the span micro-grammar (synth.py): heading
level in the ``h<level>: `` text prefix, link rel/target after ``|`` in the
anchor text, script async/defer in the script text, image dimensions in
the ``?w=&h=`` ref query, meta families as ``key: value`` texts. Response
headers arrive as a ``map<string, array<string>>`` column and feed the
four header-reading families (canonical, directives, pagespeed — and
content-encoding compression), matching the reference item's
``response_headers`` (domain_spider.py:556-571).

Family → reference worker mapping (docstrings cite the semantics source):
  page_title        ~ parser/workers/page_title_worker.py:45-230 (W1)
  meta_description  ~ parser/workers/meta_description_worker.py:45-96 (W2)
  headings_data     ~ parser/workers/headings_worker.py:49-413 (W3)
  canonical_data    ~ parser/workers/canonical_worker.py:47-268 (W4)
  directives_data   ~ parser/workers/directives_worker.py:47-461 (W5)
  ga_analytics      ~ parser/workers/google_analytics_worker.py:31-190 (W6)
  hreflang_data     ~ parser/workers/hreflang_worker.py:51-383 (W7)
  images_data       ~ parser/workers/images_worker.py:49-265 (W8)
  javascript_data   ~ parser/workers/javascript_worker.py:46-497 (W9)
  links_data        ~ parser/workers/links_worker.py:47-434 (W10/L2)
  mobile_data       ~ parser/workers/mobile_worker.py:49-413 (W11)
  text_metrics      ~ parser/workers/page_elements_worker.py:48-461 (W12)
  pagespeed_data    ~ parser/workers/pagespeed_worker.py:46-535 (W13)
  structured_data   ~ parser/workers/structured_worker.py:48-453 (W14)
  third_party_services ~ third_party_services_worker.py:44-802 (W15)
  uri_data          ~ parser/workers/uri_worker.py:60-511 (W18)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPANS = "spans"

# stopwords for the title/h1/h2 keyword-overlap analysis
# (headings_worker.py:306-377 builds >3-char stopworded token sets)
_STOPWORDS = ["the", "and", "for", "with", "from", "this", "that", "page"]

# W15 third-party signature tables (third_party_services_worker.py:44-89):
# src-URL signatures matched over external script refs, and in-body JS
# signatures matched over inline script bodies — a service is detected if
# EITHER surface hits (the reference matches both against the raw HTML).
INLINE_JS_SIGNATURES = {
    "google_analytics": ("window.dataLayer", "gtag(", "_gaq",
                         "GoogleAnalyticsObject"),
    "facebook_pixel": ("fbq(",),
    "hotjar": ("hjSettings", "hj.q"),
    "optimizely": ("optimizelyDatafile",),
    "intercom": ("intercomSettings",),
    "zendesk": ("zE(",),
    "segment": ("analytics.load",),
    "mixpanel": ("mixpanel.init",),
    "new_relic": ("NREUM",),
    "fullstory": ("FS.",),
    "amplitude": ("amplitude.init",),
}
THIRD_PARTY_SIGNATURES = {
    "google_tag_manager": "googletagmanager.com",
    "google_analytics": "google-analytics.com",
    "facebook_pixel": "connect.facebook.net",
    "hotjar": "hotjar.com",
    "segment": "cdn.segment.com",
    "intercom": "intercomcdn.com",
    "mixpanel": "mxpnl.com",
    "linkedin_insight": "licdn.com",
    "tiktok_pixel": "analytics.tiktok.com",
    "jsdelivr": "cdn.jsdelivr.net",
    "cdnjs": "cdnjs.cloudflare.com",
    "crazyegg": "crazyegg.com",
    "callrail": "callrail.com",
    "optimizely": "optimizely.com",
    "zendesk": "zdassets.com",
    "drift": "driftt.com",
    "new_relic": "newrelic.com",
    "vwo": "visualwebsiteoptimizer.com",
    "fullstory": "fullstory.com",
    "amplitude": "amplitude.com",
    "mouseflow": "mouseflow.com",
    "hubspot": "hs-scripts.com",
    "lucky_orange": "luckyorange.com",
    "sumo": "sumo.com",
    "adobe_analytics": "adobedtm.com",
}

# W9 framework signatures — javascript_worker.py:224-251's 15 library
# indicators (same `key in src.lower()` contains-semantics and display
# names as the reference)
FRAMEWORK_SIGNATURES = {
    "jQuery": "jquery",
    "React": "react",
    "Angular": "angular",
    "Vue.js": "vue",
    "Ember.js": "ember",
    "Backbone.js": "backbone",
    "Knockout.js": "knockout",
    "Prototype.js": "prototype",
    "MooTools": "mootools",
    "Dojo": "dojo",
    "GSAP": "gsap",
    "Three.js": "three.js",
    "D3.js": "d3",
    "Leaflet": "leaflet",
    "Moment.js": "moment",
}
# javascript_worker.py:_detect_spa spa_frameworks list
_SPA_FRAMEWORKS = ("React", "Angular", "Vue.js", "Ember.js")

# W15 CSS-framework / page-builder class-token signatures
# (third_party_services_worker.py:154-175; detected over the bodyclass
# meta — the span grammar's class-attribute signal)
CSS_FRAMEWORK_SIGNATURES = {
    "bootstrap": "bootstrap",
    "foundation": "foundation",
    "bulma": "bulma",
    "tailwind": "tailwind",
    "materialize": "materialize",
    "semantic_ui": "semantic",
    "pure_css": "pure-",
    "skeleton": "skeleton",
}
PAGE_BUILDER_SIGNATURES = {
    "elementor": "elementor",
    "visual_composer": "vc_",
    "beaver_builder": "fl-builder",
    "siteorigin": "siteorigin",
    "gutenberg": "wp-block-",
    "oxygen": "ct-section",
    "brizy": "brz-",
    "thrive_architect": "thrv_",
    "cornerstone": "cs-content",
}


def _of_kind(kind: str) -> Column:
    return F.filter(F.col(SPANS), lambda s: s["kind"] == F.lit(kind))


def _texts(col: Column) -> Column:
    return F.transform(col, lambda s: s["text"])


def _refs(col: Column) -> Column:
    return F.transform(col, lambda s: s["media_ref"])


def _metas() -> Column:
    return _texts(_of_kind("meta"))


def _meta_first(prefix: str) -> Column:
    """First meta value for ``<prefix>: <value>`` (None if absent)."""
    hit = F.get(F.filter(_metas(), lambda t: t.startswith(f"{prefix}: ")), 0)
    return F.regexp_replace(hit, f"^{prefix}: ", "")


def _header_joined(headers_col: str | None, key: str) -> Column:
    """All values of a response header joined with ',' ('' when absent or
    when the docs frame carries no headers column)."""
    if headers_col is None:
        return F.lit("")
    vals = F.try_element_at(F.col(headers_col), F.lit(key))
    return F.coalesce(F.concat_ws(",", vals), F.lit(""))


# ---------------------------------------------------------------------------
# W1 page_title (+ OpenGraph)
# ---------------------------------------------------------------------------


def page_title_struct() -> Column:
    """W1: first title text + length; meta robots; the full 10-prop
    OpenGraph surface (page_title_worker.py:166-177: locale/type/title/
    description/url/site_name/image/image_width/image_height/image_type)."""
    titles = _texts(_of_kind("title"))
    title = F.get(titles, 0)
    metas = _metas()
    robots = F.get(F.filter(metas, lambda t: t.startswith("robots:")), 0)
    og = F.filter(metas, lambda t: t.startswith("og:"))
    og_props = F.array_distinct(
        F.transform(og, lambda t: F.regexp_extract(t, r"^og:([a-z_]+): ", 1))
    )
    return F.struct(
        title.alias("title"),
        F.coalesce(F.length(title), F.lit(0)).alias("title_length"),
        F.size(titles).alias("title_count"),
        F.regexp_replace(F.coalesce(robots, F.lit("")), "^robots: ", "").alias("robots"),
        F.size(og).alias("og_count"),
        F.sort_array(og_props).alias("og_props"),
        _meta_first("og:title").alias("og_title"),
        _meta_first("og:description").alias("og_description"),
        _meta_first("og:image").alias("og_image"),
        _meta_first("og:url").alias("og_url"),
        _meta_first("og:type").alias("og_type"),
        _meta_first("og:site_name").alias("og_site_name"),
        _meta_first("og:locale").alias("og_locale"),
        _meta_first("og:image_width").alias("og_image_width"),
        _meta_first("og:image_height").alias("og_image_height"),
        _meta_first("og:image_type").alias("og_image_type"),
        (F.size(og) > 0).alias("has_og"),
    )


def meta_description_struct() -> Column:
    """W2: first description meta + the 120/160 length bounds the
    reference flags (meta_description_worker.py:45-96,
    page_elements_worker.py meta metrics)."""
    desc = _meta_first("description")
    ln = F.coalesce(F.length(desc), F.lit(0))
    return F.struct(
        desc.alias("meta_description"),
        ln.alias("length"),
        ((ln > 0) & (ln < 120)).alias("too_short"),
        (ln > 160).alias("too_long"),
    )


# ---------------------------------------------------------------------------
# W3 headings: per-level aggregation + hierarchy + keyword overlap
# ---------------------------------------------------------------------------


def _token_set(txt: Column) -> Column:
    """Stopworded >3-char token set (headings_worker.py:306-340)."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(txt, F.lit(""))), " "),
            lambda w: (F.length(w) > 3) & ~w.isin(_STOPWORDS),
        )
    )


def _overlap_pct(a: Column, b: Column) -> Column:
    """% of ``a``'s tokens found in ``b`` (headings_worker.py:342-377)."""
    inter = F.size(F.array_intersect(a, b))
    return F.when(
        (F.size(a) > 0) & (F.size(b) > 0),
        F.round(F.lit(100.0) * inter / F.size(a), 1),
    )


def headings_struct() -> Column:
    """W3 (headings_worker.py:49-413): per-level h1-h6 counts (:167-245),
    duplicates (:181-206), hierarchy — first level, first-not-h1, skipped
    level jumps (:247-292) — and title/h1/h2 keyword overlap (:306-377).
    Heading level rides in the ``h<level>: `` text prefix."""
    hs = _texts(_of_kind("heading"))
    lens = F.transform(hs, F.length)
    n = F.size(hs)
    total = F.aggregate(lens, F.lit(0), lambda a, x: a + x)
    levels = F.transform(
        hs, lambda t: F.regexp_extract(t, r"^h([1-6]): ", 1).cast("int")
    )
    per_level = [
        F.size(F.filter(levels, lambda x: x == F.lit(lv))).alias(f"h{lv}")
        for lv in range(1, 7)
    ]
    first_level = F.get(levels, 0)
    # skipped jumps: adjacent pairs where the level increases by >1
    # (aggregate with a (prev, cnt) struct accumulator — pure JVM fold)
    init = F.struct(F.lit(0).alias("prev"), F.lit(0).alias("cnt"))
    skipped = F.aggregate(
        levels,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["cnt"]
                + F.when((acc["prev"] > 0) & (x > acc["prev"] + 1), 1).otherwise(0)
            ).alias("cnt"),
        ),
        lambda acc: acc["cnt"],
    )
    strip = lambda t: F.regexp_replace(t, r"^h[1-6]: ", "")  # noqa: E731
    title = F.get(_texts(_of_kind("title")), 0)
    h_of = lambda lv: F.concat_ws(  # noqa: E731
        " ",
        F.transform(F.filter(hs, lambda t: t.startswith(f"h{lv}: ")), strip),
    )
    t_set = _token_set(title)
    return F.struct(
        n.alias("count"),
        hs.alias("texts"),
        F.array_min(lens).alias("min_length"),
        F.array_max(lens).alias("max_length"),
        F.when(n > 0, F.round(total / n, 2)).alias("avg_length"),
        (n - F.size(F.array_distinct(hs))).alias("duplicate_count"),
        F.size(F.filter(hs, lambda t: F.length(t) == 0)).alias("empty_count"),
        *per_level,
        first_level.alias("first_level"),
        F.when(n > 0, first_level != 1).alias("first_not_h1"),
        skipped.alias("skipped_jumps"),
        _overlap_pct(t_set, _token_set(h_of(1))).alias("title_h1_overlap_pct"),
        _overlap_pct(t_set, _token_set(h_of(2))).alias("title_h2_overlap_pct"),
    )


# ---------------------------------------------------------------------------
# W10/L2 links: full class breakdown + rollups + issues
# ---------------------------------------------------------------------------


def _anchor(t: Column) -> Column:
    return F.regexp_extract(F.coalesce(t, F.lit("")), r"^([^|]*)", 1)


def _link_attrs(t: Column) -> Column:
    return F.regexp_extract(F.coalesce(t, F.lit("")), r"\|(.*)$", 1)


def _is_special_ref(r: Column) -> Column:
    return (
        r.startswith("mailto:")
        | r.startswith("tel:")
        | r.startswith("#")
        | r.startswith("javascript:")
    )


def links_struct(host_col: str | None = "host") -> Column:
    """W10/L2 (links_worker.py:47-434): per-class counts — internal
    (subdomain-aware, :256-354) / external / nofollow / sponsored / ugc /
    blank-target / mailto / tel / fragment / javascript — plus anchor-text
    frequency map (:98-101), external-domain set (:152-156) and issue
    flags (:384-418). Link rel/target attrs ride after ``|`` in the
    anchor text."""
    links = _of_kind("link")
    refs = _refs(links)
    anchors = F.transform(links, lambda s: _anchor(s["text"]))
    attrs = F.transform(links, lambda s: _link_attrs(s["text"]))
    n = F.size(refs)
    uniq = F.size(F.array_distinct(refs))
    attr_count = lambda a: F.size(F.filter(attrs, lambda t: t.contains(a)))  # noqa: E731
    special = F.size(F.filter(refs, _is_special_ref))
    if host_col is not None:
        host = F.col(host_col)
        # scheme/host compare is case-insensitive (links_worker.py lowercases
        # before classifying; dirty uppercase hrefs are the same host)
        ref_host = lambda r: F.lower(  # noqa: E731
            F.regexp_extract(r, r"^(?i)https?://([^/]+)", 1)
        )
        is_internal = lambda r: ~_is_special_ref(r) & (  # noqa: E731
            ~r.contains("://")
            | (ref_host(r) == host)
            | (ref_host(r) == F.concat(F.lit("www."), host))
            | ref_host(r).endswith(F.concat(F.lit("."), host))
        )
        internal = F.size(F.filter(refs, is_internal))
        ext_domains = F.sort_array(
            F.array_distinct(
                F.transform(
                    F.filter(
                        refs,
                        lambda r: r.contains("://")
                        & ~_is_special_ref(r)
                        & ~is_internal(r),
                    ),
                    ref_host,
                )
            )
        )
    else:
        internal = F.lit(None).cast("int")
        ext_domains = F.lit(None).cast("array<string>")
    uniq_anchors = F.array_distinct(F.transform(anchors, F.lower))
    anchor_freq = F.map_from_arrays(
        uniq_anchors,
        F.transform(
            uniq_anchors,
            lambda a: F.size(F.filter(anchors, lambda x: F.lower(x) == a)),
        ),
    )
    nofollow = attr_count("nofollow")
    return F.struct(
        n.alias("total"),
        uniq.alias("unique"),
        internal.alias("internal"),
        (n - internal - special).alias("external"),
        special.alias("special"),
        F.size(F.filter(anchors, lambda t: t.isNull() | (F.length(t) == 0))).alias(
            "missing_text"
        ),
        nofollow.alias("nofollow"),
        attr_count("sponsored").alias("sponsored"),
        attr_count("ugc").alias("ugc"),
        attr_count("blank").alias("blank_target"),
        F.size(F.filter(refs, lambda r: r.startswith("mailto:"))).alias("mailto"),
        F.size(F.filter(refs, lambda r: r.startswith("tel:"))).alias("tel"),
        F.size(F.filter(refs, lambda r: r.startswith("#"))).alias("fragment"),
        F.size(F.filter(refs, lambda r: r.startswith("javascript:"))).alias(
            "javascript"
        ),
        ext_domains.alias("external_domains"),
        anchor_freq.alias("anchor_freq"),
        (n > 100).alias("too_many_links"),
        ((n > 0) & (nofollow * 2 > n)).alias("high_nofollow_ratio"),
    )


# ---------------------------------------------------------------------------
# W8 images: dimensions, size buckets
# ---------------------------------------------------------------------------


def _extension_counts(refs: Column) -> Column:
    """Per-extension image count map (images_worker.py:244-264
    ``extension_counts`` — splitext-style '.ext' keys, lowercased).
    O(k²) HOF over the per-row array (k is tiny); no shuffle."""
    exts = F.transform(
        refs, lambda r: F.lower(F.regexp_extract(r, r"(\.[A-Za-z0-9]+)([?#].*)?$", 1))
    )
    present = F.array_distinct(F.filter(exts, lambda x: F.length(x) > 0))
    return F.map_from_arrays(
        present,
        F.transform(present, lambda e: F.size(F.filter(exts, lambda x: x == e))),
    )


def _dim_of(r: Column, key: str) -> Column:
    v = F.regexp_extract(r, rf"[?&]{key}=(\d+)", 1)
    return F.when(F.length(v) > 0, v.cast("int"))


def images_struct() -> Column:
    """W8 (images_worker.py:49-265): alt coverage, dimension parse from the
    ref's ?w=&h= query (attr/style in the reference, :127-180), over/under
    -sized buckets (>1000 / <100 px, :227-245)."""
    imgs = _of_kind("image")
    refs = _refs(imgs)
    w_of = lambda r: _dim_of(r, "w")  # noqa: E731
    h_of = lambda r: _dim_of(r, "h")  # noqa: E731
    with_dims = F.filter(refs, lambda r: w_of(r).isNotNull() & h_of(r).isNotNull())
    return F.struct(
        F.size(refs).alias("total"),
        F.size(F.array_distinct(refs)).alias("unique"),
        F.size(
            F.filter(_texts(imgs), lambda t: t.isNull() | (F.length(t) == 0))
        ).alias("missing_alt"),
        F.size(with_dims).alias("with_dimensions"),
        F.size(
            F.filter(refs, lambda r: (w_of(r) > 1000) | (h_of(r) > 1000))
        ).alias("oversized"),
        F.size(
            F.filter(refs, lambda r: (w_of(r) < 100) & (h_of(r) < 100))
        ).alias("undersized"),
        _extension_counts(refs).alias("extension_counts"),
    )


# ---------------------------------------------------------------------------
# W5 directives: meta robots + X-Robots-Tag header
# ---------------------------------------------------------------------------


def directives_struct(headers_col: str | None = None) -> Column:
    """W5 (directives_worker.py:47-461): meta robots AND the X-Robots-Tag
    response header (:47-120 reads both sources) merged into one directive
    verdict; noarchive tracked; implied defaults for index/follow."""
    metas = _metas()
    robots_meta = F.concat_ws(",", F.filter(metas, lambda t: t.startswith("robots:")))
    x_robots = _header_joined(headers_col, "x-robots-tag")
    combined = F.concat_ws(",", robots_meta, x_robots)
    has_noindex = combined.contains("noindex")
    has_nofollow = combined.contains("nofollow")
    # unavailable_after directive value (directives_worker.py parses it
    # out of the robots content alongside the boolean directives)
    unavailable_after = F.when(
        combined.contains("unavailable_after:"),
        F.regexp_extract(combined, r"unavailable_after:\s*([^,]+)", 1),
    )
    return F.struct(
        F.regexp_replace(robots_meta, "^robots: ", "").alias("robots_meta"),
        x_robots.alias("x_robots_tag"),
        has_noindex.alias("has_noindex"),
        has_nofollow.alias("has_nofollow"),
        combined.contains("noarchive").alias("has_noarchive"),
        unavailable_after.alias("unavailable_after"),
        (~has_noindex).alias("is_indexable"),
        (~has_nofollow).alias("is_followable"),
    )


# ---------------------------------------------------------------------------
# W9 javascript: attrs, frameworks, SPA, render-blocking
# ---------------------------------------------------------------------------


def javascript_struct() -> Column:
    """W9 (javascript_worker.py:46-497): external/inline split + async/
    defer/module counts (:46-200), framework detection over src URLs
    (:219-320 — 15 libs in the reference, the CDN-visible slice here),
    SPA indicator, render-blocking = external without async|defer
    (pagespeed_worker.py render-blocking rule), inline byte total."""
    scripts = _of_kind("script")
    ext = F.filter(scripts, lambda s: s["media_ref"].isNotNull())
    inline = F.filter(scripts, lambda s: s["media_ref"].isNull())
    attr_count = lambda a: F.size(  # noqa: E731
        F.filter(ext, lambda s: F.coalesce(s["text"], F.lit("")).contains(a))
    )
    render_blocking = F.size(
        F.filter(
            ext,
            lambda s: ~F.coalesce(s["text"], F.lit("")).rlike("async|defer"),
        )
    )
    # inline scripts carry their raw JS body as the span text
    inline_bytes = F.aggregate(
        F.transform(
            inline, lambda s: F.coalesce(F.length(s["text"]), F.lit(0))
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    lower_refs = F.transform(ext, lambda s: F.lower(s["media_ref"]))
    fw_hits = [
        F.when(F.exists(lower_refs, lambda r: r.contains(sig)), F.lit(name))
        for name, sig in FRAMEWORK_SIGNATURES.items()
    ]
    frameworks = F.sort_array(
        F.filter(F.array(*fw_hits), lambda x: x.isNotNull())
    )
    spa = F.exists(
        frameworks, lambda f: f.isin(*[F.lit(x) for x in _SPA_FRAMEWORKS])
    )
    n_total = F.size(scripts)
    return F.struct(
        n_total.alias("total"),
        F.size(ext).alias("external"),
        F.size(inline).alias("inline"),
        attr_count("async").alias("async_count"),
        attr_count("defer").alias("defer_count"),
        attr_count("module").alias("module_count"),
        render_blocking.alias("render_blocking"),
        inline_bytes.alias("inline_bytes"),
        frameworks.alias("frameworks"),
        (F.size(frameworks) > 0).alias("has_framework"),
        spa.alias("spa_indicator"),
        (n_total > 15).alias("many_scripts"),
    )


# ---------------------------------------------------------------------------
# W12 text metrics
# ---------------------------------------------------------------------------


def text_metrics_struct() -> Column:
    """W12 (page_elements_worker.py:247-335): words, text chars, paragraph
    (= text span) count, span-mix ratio, html-size proxy (max offset)."""
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
    html_size = F.array_max(F.transform(F.col(SPANS), lambda s: s["offset"]))
    # sentences: [.!?]+ split, non-empty after trim
    # (page_elements_worker.py:289-292), summed over the text-bearing spans
    sentences = F.aggregate(
        F.transform(
            texts,
            lambda t: F.size(
                F.filter(
                    F.split(t, r"[.!?]+"),
                    lambda s: F.length(F.trim(s)) > 0,
                )
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return F.struct(
        words.alias("word_count"),
        chars.alias("text_chars"),
        F.size(_of_kind("text")).alias("paragraphs"),
        sentences.alias("sentence_count"),
        # avg_words_per_sentence rounded to 1 place (:299)
        F.when(sentences > 0, F.round(words / sentences, 1))
        .otherwise(F.lit(0.0))
        .alias("avg_words_per_sentence"),
        n_spans.alias("span_count"),
        F.when(n_spans > 0, F.round(F.size(texty) / n_spans, 4)).alias("text_span_ratio"),
        html_size.alias("html_size"),
    )


# ---------------------------------------------------------------------------
# W18 uri: decomposition + readability + issues
# ---------------------------------------------------------------------------


def uri_struct(url_col: str = "url_norm") -> Column:
    """W18 (uri_worker.py:60-511): path decomposition + query-param
    classification (:60-220), SEO keywords from path segments (:280-330),
    readability = 100 − penalties (:340-420), issue flags (:430-511)."""
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
    depth = F.size(segs)
    has_upper = path.rlike("[A-Z]")
    has_under = path.contains("_")
    many_params = F.size(params) > 3
    long_url = F.length(url) > 100
    deep = depth > 5
    special = path.rlike(r"[^a-zA-Z0-9/._\-]")
    keywords = F.sort_array(
        F.array_distinct(
            F.flatten(
                F.transform(
                    segs, lambda s: F.filter(
                        F.split(F.lower(s), "[-_.]"), lambda w: F.length(w) > 3
                    )
                )
            )
        )
    )
    readability = (
        F.lit(100)
        - F.when(has_upper, 15).otherwise(0)
        - F.when(has_under, 10).otherwise(0)
        - F.when(many_params, 10).otherwise(0)
        - F.when(tracking > 0, 10).otherwise(0)
        - F.when(deep, 10).otherwise(0)
        - F.when(long_url, 10).otherwise(0)
        - F.when(special, 10).otherwise(0)
    )
    return F.struct(
        path.alias("path"),
        depth.alias("depth"),
        segs.alias("segments"),
        ext.alias("extension"),
        (F.length(query) > 0).alias("has_query"),
        F.size(params).alias("param_count"),
        tracking.alias("tracking_param_count"),
        has_upper.alias("has_uppercase"),
        has_under.alias("has_underscores"),
        keywords.alias("seo_keywords"),
        F.greatest(readability, F.lit(0)).alias("readability"),
        (many_params | (tracking > 0) | deep | long_url).alias("has_issues"),
    )


# ---------------------------------------------------------------------------
# W4 canonical: HTML link + HTTP Link header
# ---------------------------------------------------------------------------


def canonical_struct(
    url_col: str = "url_norm", headers_col: str | None = None
) -> Column:
    """W4 (canonical_worker.py:47-268): HTML canonical (+multiples), the
    HTTP ``Link: <url>; rel="canonical"`` header path (:96-140),
    self-canonical check (:205-234), header/HTML conflict, noindex
    conflict."""
    metas = _metas()
    canon = F.filter(metas, lambda t: t.startswith("canonical:"))
    href = F.regexp_replace(F.get(canon, 0), "^canonical: ", "")
    link_hdr = _header_joined(headers_col, "link")
    # pull the <url> bound to rel="canonical" specifically — the link
    # header may also carry rel="alternate" hreflang values (W7)
    hdr_href = F.when(
        link_hdr.contains('rel="canonical"'),
        F.regexp_extract(link_hdr, r"<([^>]*)>;\s*rel=\"canonical\"", 1),
    )
    robots = F.concat_ws(",", F.filter(metas, lambda t: t.startswith("robots:")))
    return F.struct(
        href.alias("canonical_url"),
        F.size(canon).alias("canonical_count"),
        hdr_href.alias("header_canonical"),
        (href == F.col(url_col)).alias("is_self_canonical"),
        (
            href.isNotNull() & hdr_href.isNotNull() & (href != hdr_href)
        ).alias("header_html_conflict"),
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


def hreflang_struct(
    url_col: str = "url_norm", headers_col: str | None = None
) -> Column:
    """W7: hreflang alternates from BOTH sources the reference reads
    (hreflang_worker.py:51-383): HTML link alternates (the hreflang:
    meta) and HTTP ``Link: <url>; rel="alternate"; hreflang="..."``
    header values; lang-code regex validation, self-reference,
    x-default."""
    metas = _metas()
    hl = F.filter(metas, lambda t: t.startswith("hreflang:"))
    html_entries = F.transform(
        hl,
        lambda t: F.struct(
            F.regexp_extract(t, r"^hreflang: (\S+) ", 1).alias("lang"),
            F.regexp_extract(t, r"^hreflang: \S+ (.*)$", 1).alias("href"),
        ),
    )
    if headers_col is not None:
        link_vals = F.coalesce(
            F.try_element_at(F.col(headers_col), F.lit("link")),
            F.array().cast("array<string>"),
        )
        hdr_entries = F.transform(
            F.filter(
                link_vals,
                lambda v: v.contains('rel="alternate"') & v.contains("hreflang="),
            ),
            lambda v: F.struct(
                F.regexp_extract(v, r'hreflang="([^"]+)"', 1).alias("lang"),
                F.regexp_extract(v, r"<([^>]*)>", 1).alias("href"),
            ),
        )
    else:
        hdr_entries = F.array().cast(
            "array<struct<lang:string,href:string>>"
        )
    entries = F.concat(html_entries, hdr_entries)
    langs = F.array_distinct(F.transform(entries, lambda e: e["lang"]))
    valid = F.filter(
        langs, lambda code: code.rlike("^[a-z]{2}(-[a-z]{2})?$")
    )
    self_ref = F.exists(
        entries, lambda e: e["href"].startswith(F.col(url_col))
    )
    return F.struct(
        F.size(entries).alias("count"),
        F.size(hdr_entries).alias("header_count"),
        langs.alias("langs"),
        (F.size(langs) - F.size(valid)).alias("invalid_lang_count"),
        self_ref.alias("has_self_reference"),
        F.array_contains(
            F.transform(entries, lambda e: e["lang"]), "x-default"
        ).alias("has_x_default"),
    )


# ---------------------------------------------------------------------------
# W11 mobile: viewport parse + 100-minus-penalties score
# ---------------------------------------------------------------------------


def mobile_struct() -> Column:
    """W11 (mobile_worker.py:49-413), full reference penalty table
    (:361-398): 100 − 40·missing-viewport (ELSE 25·not-responsive) −
    15·tap-targets − 15·small-fonts − 20·flash − 20·horizontal-scroll −
    15·fixed-width − 10·zoom-disabled − 10·text-size-adjust-disabled −
    5·separate-mobile-site − 10·interstitial, clamped to [0,100];
    verdict likely ≥80 / possibly ≥60 / else unlikely (:400-413).

    Signals: viewport meta (:139-169: responsive needs device-width AND
    initial-scale=1, or any @media query in a style body, :270-291);
    text-size-adjust detection + ':none' disable (:283-291); tap targets
    = button style 'width: 2'/'height: 2' or a style 'padding: 0'
    (:306-326); small fonts 'font-size: 1|0' (:301-305); fixed width =
    body width / div 'width: 9|10|11|12' when not responsive (:328-331);
    horizontal scroll = body overflow[-x]: visible (:334-337);
    interstitial = modal/popup/overlay/interstitial class (:339-342);
    plugins flash/java (:344-360); separate mobile site = alternate link
    (:215-240, the altmobile meta)."""
    metas = _metas()
    vp = F.get(F.filter(metas, lambda t: t.startswith("viewport:")), 0)
    has_vp = vp.isNotNull()
    vp_device = has_vp & vp.contains("width=device-width")
    initial_scale = has_vp & vp.contains("initial-scale=1")
    zoom_disabled = has_vp & vp.contains("user-scalable=no")
    amp = F.exists(metas, lambda t: t.startswith("amphtml:"))

    # style bodies: the reference concatenates style.string verbatim
    css = F.concat_ws("", _texts(_of_kind("style")))
    media_queries = F.size(F.split(css, "@media")) - 1
    is_responsive = (vp_device & initial_scale) | (media_queries > 0)
    tsa_found = css.contains("text-size-adjust")
    tsa_disabled = css.contains("text-size-adjust: none") | css.contains(
        "text-size-adjust:none"
    )

    els = _texts(_of_kind("el"))
    tagged = lambda tag: F.filter(  # noqa: E731
        els, lambda t: t.startswith(f"{tag}|")
    )
    el_has = lambda tag, tok: F.exists(  # noqa: E731
        tagged(tag), lambda t: t.contains(tok)
    )
    tap_targets = (
        el_has("button", "width: 2")
        | el_has("button", "height: 2")
        | el_has("a", "padding: 0")
        | el_has("a", "padding:0")
    )
    font_issues = F.exists(
        els,
        lambda t: t.contains("font-size: 1")
        | t.contains("font-size:1")
        | t.contains("font-size: 0")
        | t.contains("font-size:0"),
    )
    fixed_width = (
        el_has("body", "width:")
        | el_has("div", "width: 9")
        | el_has("div", "width: 10")
        | el_has("div", "width: 11")
        | el_has("div", "width: 12")
    ) & ~is_responsive
    hscroll = (
        el_has("body", "overflow-x:visible")
        | el_has("body", "overflow-x: visible")
        | el_has("body", "overflow:visible")
        | el_has("body", "overflow: visible")
    )
    interstitial = F.exists(
        els,
        lambda t: t.contains("class=")
        & (
            t.contains("modal")
            | t.contains("popup")
            | t.contains("overlay")
            | t.contains("interstitial")
        ),
    )
    flash = (el_has("object", "flash")) | (el_has("embed", "flash"))
    java = (F.size(tagged("applet")) > 0) | el_has("object", "java")
    plugins = F.filter(
        F.array(
            F.when(flash, F.lit("flash")), F.when(java, F.lit("java"))
        ),
        lambda x: x.isNotNull(),
    )
    separate_mobile = F.exists(metas, lambda t: t.startswith("altmobile:"))

    raw_score = (
        F.lit(100)
        - F.when(~has_vp, 40).otherwise(F.when(~is_responsive, 25).otherwise(0))
        - F.when(tap_targets, 15).otherwise(0)
        - F.when(font_issues, 15).otherwise(0)
        - F.when(flash, 20).otherwise(0)
        - F.when(hscroll, 20).otherwise(0)
        - F.when(fixed_width, 15).otherwise(0)
        - F.when(zoom_disabled, 10).otherwise(0)
        - F.when(tsa_disabled, 10).otherwise(0)
        - F.when(separate_mobile, 5).otherwise(0)
        - F.when(interstitial, 10).otherwise(0)
    )
    score = F.greatest(F.lit(0), F.least(F.lit(100), raw_score))
    verdict = (
        F.when(score >= 80, F.lit("likely"))
        .when(score >= 60, F.lit("possibly"))
        .otherwise(F.lit("unlikely"))
    )
    return F.struct(
        has_vp.alias("has_viewport"),
        vp_device.alias("responsive_width"),
        initial_scale.alias("has_initial_scale"),
        zoom_disabled.alias("user_scalable_no"),
        is_responsive.alias("is_responsive"),
        media_queries.alias("media_queries_count"),
        F.when(tsa_disabled, F.lit("disabled"))
        .when(tsa_found, F.lit("found"))
        .alias("text_size_adjustment"),
        tap_targets.alias("tap_target_issues"),
        font_issues.alias("font_size_issues"),
        fixed_width.alias("fixed_width_layout"),
        hscroll.alias("horizontal_scrolling"),
        interstitial.alias("possible_intrusive_interstitial"),
        flash.alias("flash_used"),
        plugins.alias("plugins_used"),
        separate_mobile.alias("separate_mobile_site"),
        amp.alias("has_amp_link"),
        score.alias("score"),
        verdict.alias("mobile_friendly"),
    )


# ---------------------------------------------------------------------------
# W14 structured data: JSON-LD + microdata type flags
# ---------------------------------------------------------------------------

# schema.org type -> reference flag name (structured_worker.py:76-90 —
# all 15 has_* flags)
_SCHEMA_FLAG_TYPES = {
    "Organization": "has_organization",
    "WebSite": "has_website",
    "WebPage": "has_webpage",
    "BreadcrumbList": "has_breadcrumb",
    "Product": "has_product",
    "Review": "has_review",
    "AggregateRating": "has_aggregate_rating",
    "LocalBusiness": "has_local_business",
    "Article": "has_article",
    "Event": "has_event",
    "Recipe": "has_recipe",
    "FAQPage": "has_faq",
    "Person": "has_person",
    "VideoObject": "has_video",
    "HowTo": "has_how_to",
}


def structured_data_struct() -> Column:
    """W14 (structured_worker.py:48-453): JSON-LD + Microdata types with
    the reference's full 15 has_* flag set (:76-90) over jsonld:/
    microdata: metas."""
    metas = _metas()
    jsonld = F.transform(
        F.filter(metas, lambda t: t.startswith("jsonld:")),
        lambda t: F.regexp_replace(t, "^jsonld: ", ""),
    )
    micro = F.transform(
        F.filter(metas, lambda t: t.startswith("microdata:")),
        lambda t: F.regexp_replace(t, "^microdata: ", ""),
    )
    types = F.sort_array(F.array_distinct(F.concat(jsonld, micro)))
    flags = [
        F.array_contains(types, t).alias(flag)
        for t, flag in _SCHEMA_FLAG_TYPES.items()
    ]
    return F.struct(
        (F.size(jsonld) + F.size(micro)).alias("schema_count"),
        F.array_distinct(jsonld).alias("jsonld_types"),
        F.array_distinct(micro).alias("microdata_types"),
        types.alias("types"),
        *flags,
    )


# ---------------------------------------------------------------------------
# W15 third-party services: signatures + CMS + theme
# ---------------------------------------------------------------------------


def third_party_struct(host_col: str = "host") -> Column:
    """W15 (third_party_services_worker.py:44-802): the ~24-service
    signature table over external script refs (THIRD_PARTY_SIGNATURES)
    UNION the in-body JS signatures over inline script bodies
    (INLINE_JS_SIGNATURES — 'gtag(', 'fbq(', 'hjSettings', ... matched
    case-sensitively like the reference's `pattern in html_content`),
    CMS from generator meta + path signatures (:520-610), WP theme from
    /wp-content/themes/ paths (:612-700), CSS-framework and page-builder
    class-token detection (:154-175) over the bodyclass meta."""
    scripts = _of_kind("script")
    refs = _refs(scripts)
    ext = F.filter(
        refs,
        lambda r: r.isNotNull()
        & r.contains("://")
        & ~r.contains(F.col(host_col)),
    )
    domains = F.array_distinct(
        F.transform(ext, lambda r: F.regexp_extract(r, r"^https?://([^/]+)", 1))
    )
    inline_bodies = F.transform(
        F.filter(scripts, lambda s: s["media_ref"].isNull()),
        lambda s: F.coalesce(s["text"], F.lit("")),
    )
    hits = []
    for name, sig in THIRD_PARTY_SIGNATURES.items():
        src_hit = F.exists(ext, lambda r: r.contains(sig))
        js_hit = F.lit(False)
        for tok in INLINE_JS_SIGNATURES.get(name, ()):
            js_hit = js_hit | F.exists(inline_bodies, lambda b: b.contains(tok))
        hits.append(F.when(src_hit | js_hit, F.lit(name)))
    providers = F.sort_array(F.filter(F.array(*hits), lambda x: x.isNotNull()))
    generator = _meta_first("generator")
    all_refs = F.filter(
        F.transform(F.col(SPANS), lambda s: s["media_ref"]), lambda r: r.isNotNull()
    )
    # CMS: generator meta first (:520-560), path-signature fallback
    # (:561-610 — /wp-content/ et al. identify the platform without a
    # generator tag)
    cms = F.coalesce(
        F.when(
            generator.isNotNull(),
            F.regexp_extract(generator, r"^([A-Za-z.]+)", 1),
        ),
        F.when(
            F.exists(all_refs, lambda r: r.contains("/wp-content/")),
            F.lit("WordPress"),
        ),
        F.when(
            F.exists(all_refs, lambda r: r.contains("cdn.shopify.com")),
            F.lit("Shopify"),
        ),
    )
    theme = F.get(
        F.filter(
            F.transform(
                all_refs,
                lambda r: F.regexp_extract(r, r"/wp-content/themes/([^/]+)/", 1),
            ),
            lambda t: F.length(t) > 0,
        ),
        0,
    )
    # class-attribute signals (:154-175) over the bodyclass meta
    bodyclass = F.coalesce(_meta_first("bodyclass"), F.lit(""))
    css_hits = [
        F.when(bodyclass.contains(sig), F.lit(name))
        for name, sig in CSS_FRAMEWORK_SIGNATURES.items()
    ]
    css_frameworks = F.sort_array(
        F.filter(F.array(*css_hits), lambda x: x.isNotNull())
    )
    builder_hits = [
        F.when(bodyclass.contains(sig), F.lit(name))
        for name, sig in PAGE_BUILDER_SIGNATURES.items()
    ]
    page_builders = F.sort_array(
        F.filter(F.array(*builder_hits), lambda x: x.isNotNull())
    )
    return F.struct(
        F.size(ext).alias("third_party_scripts"),
        domains.alias("provider_domains"),
        providers.alias("providers"),
        (F.size(providers) > 0).alias("has_third_party"),
        F.exists(domains, lambda d: d.contains("googletagmanager")).alias(
            "has_tag_manager"
        ),
        cms.alias("cms"),
        theme.alias("wp_theme"),
        css_frameworks.alias("css_frameworks"),
        page_builders.alias("page_builders"),
        F.get(page_builders, 0).alias("page_builder"),
    )


# ---------------------------------------------------------------------------
# W13 pagespeed: resources + compression header
# ---------------------------------------------------------------------------


def pagespeed_struct(headers_col: str | None = None) -> Column:
    """W13 (pagespeed_worker.py:46-535): resource inventory, third-party
    share, render-blocking (external scripts without async|defer, :230-290),
    compression + content-length from response headers (:46-120), and the
    minified-CSS/JS heuristics over style / inline-script bodies
    (:369-386: joined content with ≤5 lines and >500 chars; JS also flags
    on a .min.js src)."""
    scripts = _of_kind("script")
    images = _of_kind("image")
    videos = _of_kind("video")
    n_res = F.size(scripts) + F.size(images) + F.size(videos)
    ext_scripts = F.filter(scripts, lambda s: s["media_ref"].isNotNull())
    render_blocking = F.size(
        F.filter(
            ext_scripts,
            lambda s: ~F.coalesce(s["text"], F.lit("")).rlike("async|defer"),
        )
    )
    enc = _header_joined(headers_col, "content-encoding")
    clen = _header_joined(headers_col, "content-length").try_cast("long")
    refs = F.transform(ext_scripts, lambda s: s["media_ref"])
    img_refs = _refs(images)
    with_dims = F.filter(
        img_refs,
        lambda r: _dim_of(r, "w").isNotNull() & _dim_of(r, "h").isNotNull(),
    )
    # minified-CSS/JS heuristics (pagespeed_worker.py:369-386): join the
    # inline bodies with '\n'; minified = few lines relative to length
    # (<=5 lines, >500 chars); JS additionally flags on any .min.js src
    styles = _texts(_of_kind("style"))
    css = F.concat_ws("\n", styles)
    has_min_css = (
        (F.size(styles) > 0)
        & (F.size(F.split(css, "\n")) <= 5)
        & (F.length(css) > 500)
    )
    inline_scripts = F.filter(scripts, lambda s: s["media_ref"].isNull())
    js = F.concat_ws(
        "\n", F.transform(inline_scripts, lambda s: F.coalesce(s["text"], F.lit("")))
    )
    has_min_js = (
        (F.size(inline_scripts) > 0)
        & (F.size(F.split(js, "\n")) <= 5)
        & (F.length(js) > 500)
    ) | F.exists(
        F.filter(refs, lambda r: r.isNotNull()), lambda r: r.contains(".min.js")
    )
    return F.struct(
        n_res.alias("resource_count"),
        F.size(scripts).alias("scripts"),
        F.size(images).alias("images"),
        F.size(videos).alias("videos"),
        F.size(ext_scripts).alias("external_scripts"),
        render_blocking.alias("render_blocking"),
        F.when(F.length(enc) > 0, enc).alias("compression"),
        (F.length(enc) > 0).alias("is_compressed"),
        clen.alias("content_length"),
        (F.size(scripts) > 5).alias("many_scripts"),
        has_min_js.alias("has_minified_js"),
        has_min_css.alias("has_minified_css"),
        (render_blocking > 0).alias("has_render_blocking_resources"),
        (F.size(img_refs) > F.size(with_dims)).alias("has_unoptimized_images"),
        (F.size(F.col(SPANS)) > 1500).alias("has_excessive_dom_size"),
        (n_res > 50).alias("has_large_network_payloads"),
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

_NEEDS_URL = {"uri_data"}
_NEEDS_HOST = {"third_party_services"}
_NEEDS_HEADERS = {"directives_data", "pagespeed_data"}  # headers optional


def parse_docs(docs: DataFrame, families: list[str] | None = None) -> DataFrame:
    """Compute all extraction families in ONE select over the docs table.

    ``docs`` needs columns: doc_id, spans; plus host (for links_data /
    third_party_services), url_norm (uri/canonical/hreflang) and
    optionally response_headers (map<string,array<string>> — the
    header-reading slices of canonical/directives/pagespeed light up when
    present). This is the engine's replacement for the reference's 15-way
    parse-job fan-out (parser/dispatch/job_dispatcher.py:24-152): same
    outputs, one pass, column-pruned, no queue."""
    names = families or list(ALL_FAMILIES)
    hdr = "response_headers" if "response_headers" in docs.columns else None
    cols = [docs["*"]]
    for name in names:
        fn = ALL_FAMILIES[name]
        if name == "links_data":
            cols.append(fn("host" if "host" in docs.columns else None).alias(name))
        elif name in ("canonical_data", "hreflang_data"):
            if "url_norm" not in docs.columns:
                continue
            cols.append(fn("url_norm", hdr).alias(name))
        elif name in _NEEDS_URL:
            if "url_norm" not in docs.columns:
                continue
            cols.append(fn("url_norm").alias(name))
        elif name in _NEEDS_HOST:
            if "host" not in docs.columns:
                continue
            cols.append(fn("host").alias(name))
        elif name in _NEEDS_HEADERS:
            cols.append(fn(hdr).alias(name))
        else:
            cols.append(fn().alias(name))
    return docs.select(*cols)
