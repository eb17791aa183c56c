"""Extraction families (extract/spans.py) vs a pure-Python span oracle.

Every test re-derives the expected field straight from synth.spans_of /
synth.response_headers_of (the ground truth) and compares the engine's
JVM-HOF output — field-level equality, not shape checks."""

import pytest

from crawler_distributed_spark import synth
from crawler_distributed_spark.extract.spans import (
    CSS_FRAMEWORK_SIGNATURES,
    FRAMEWORK_SIGNATURES,
    PAGE_BUILDER_SIGNATURES,
    THIRD_PARTY_SIGNATURES,
    _SCHEMA_FLAG_TYPES,
    _SPA_FRAMEWORKS,
    parse_docs,
)

CFG = synth.SynthConfig(n_hosts=3, pages_base=25, hot_factor=2, branching=5)

_STOP = {"the", "and", "for", "with", "from", "this", "that", "page"}


def _doc_rows(with_headers: bool = False):
    rows = []
    for u in synth.all_urls(CFG):
        spans = synth.spans_of(CFG, u)
        if not spans:
            continue
        host = u.split("/")[2]
        row = [
            synth.doc_id_of(u),
            u,
            host,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in spans
            ],
        ]
        if with_headers:
            row.append(dict(synth.response_headers_of(CFG, u)))
        rows.append(tuple(row))
    return rows


_SCHEMA = (
    "doc_id string, url_norm string, host string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(_doc_rows(), _SCHEMA)
    parsed = parse_docs(df)
    return {r["url_norm"]: r for r in parsed.collect()}


@pytest.fixture(scope="module")
def docs_h(spark):
    df = spark.createDataFrame(
        _doc_rows(with_headers=True),
        _SCHEMA + ", response_headers map<string, array<string>>",
    )
    parsed = parse_docs(df)
    return {r["url_norm"]: r for r in parsed.collect()}


def _spans(u):
    return synth.spans_of(CFG, u)


def _metas(u, prefix):
    return [t for (k, t, m, o) in _spans(u) if k == "meta" and t.startswith(prefix)]


def _links(u):
    return [(t, m) for (k, t, m, o) in _spans(u) if k == "link"]


def _anchor(t):
    return (t or "").split("|")[0]


def _attrs(t):
    return (t or "").split("|", 1)[1] if t and "|" in t else ""


def _special(r):
    return r.startswith(("mailto:", "tel:", "#", "javascript:"))


def _internal(r, host):
    if _special(r):
        return False
    if "://" not in r:
        return True
    rh = r.split("://", 1)[1].split("/", 1)[0].lower()
    return rh == host or rh == f"www.{host}" or rh.endswith(f".{host}")


# --- W1 / W2 ----------------------------------------------------------------


def test_page_title_and_og(docs):
    og_hit = 0
    for u, row in docs.items():
        titles = [t for (k, t, m, o) in _spans(u) if k == "title"]
        assert row.page_title.title == titles[0]
        assert row.page_title.title_length == len(titles[0])
        assert row.page_title.title_count == len(titles)
        ogs = _metas(u, "og:")
        assert row.page_title.og_count == len(ogs)
        assert row.page_title.has_og == bool(ogs)
        props = sorted({t.split(":")[1] for t in ogs})
        assert list(row.page_title.og_props) == props
        # the 10-prop scalar surface (page_title_worker.py:166-177)
        for prop in ("title", "description", "image", "url", "type",
                     "site_name", "locale", "image_width", "image_height",
                     "image_type"):
            ogt = [t for t in ogs if t.startswith(f"og:{prop}: ")]
            want = ogt[0].removeprefix(f"og:{prop}: ") if ogt else None
            assert row.page_title[f"og_{prop}"] == want, (u, prop)
        if ogs:
            og_hit += 1
    assert og_hit > 0


def test_meta_description(docs):
    for u, row in docs.items():
        descs = _metas(u, "description:")
        want = descs[0].removeprefix("description: ") if descs else None
        assert row.meta_description.meta_description == want
        ln = len(want) if want else 0
        assert row.meta_description.too_short == (0 < ln < 120)
        assert row.meta_description.too_long == (ln > 160)


# --- W3 headings -------------------------------------------------------------


def _tokens(txt):
    return {w for w in txt.lower().split(" ") if len(w) > 3 and w not in _STOP}


def test_headings(docs):
    checked = 0
    for u, row in docs.items():
        hs = [t for (k, t, m, o) in _spans(u) if k == "heading"]
        assert row.headings_data["count"] == len(hs)
        if hs:
            lens = [len(t) for t in hs]
            assert row.headings_data.min_length == min(lens)
            assert row.headings_data.max_length == max(lens)
            assert abs(row.headings_data.avg_length - sum(lens) / len(lens)) < 0.01
            assert row.headings_data.duplicate_count == len(hs) - len(set(hs))
            checked += 1
    assert checked > 0


def test_heading_levels_and_hierarchy(docs):
    lvl_hit = skip_hit = ovl_hit = 0
    for u, row in docs.items():
        hs = [t for (k, t, m, o) in _spans(u) if k == "heading"]
        levels = [int(t[1]) for t in hs]
        for lv in range(1, 7):
            assert row.headings_data[f"h{lv}"] == levels.count(lv)
        if levels:
            assert row.headings_data.first_level == levels[0]
            assert row.headings_data.first_not_h1 == (levels[0] != 1)
            lvl_hit += 1
        skipped = sum(
            1 for a, b in zip(levels, levels[1:]) if b > a + 1
        )
        assert row.headings_data.skipped_jumps == skipped
        if skipped:
            skip_hit += 1
        # keyword overlap title vs h1
        title = next(t for (k, t, m, o) in _spans(u) if k == "title")
        h1 = " ".join(t[4:] for t in hs if t.startswith("h1: "))
        ts, h1s = _tokens(title), _tokens(h1)
        want = round(100.0 * len(ts & h1s) / len(ts), 1) if ts and h1s else None
        got = row.headings_data.title_h1_overlap_pct
        assert (got is None) == (want is None)
        if want is not None:
            assert abs(got - want) < 0.11
            ovl_hit += 1
    assert lvl_hit > 0 and skip_hit > 0 and ovl_hit > 0


# --- W10/L2 links ------------------------------------------------------------


def test_links(docs):
    checked = 0
    for u, row in docs.items():
        host = u.split("/")[2]
        links = _links(u)
        refs = [m for _, m in links]
        assert row.links_data.total == len(refs)
        assert row.links_data.unique == len(set(refs))
        internal = sum(1 for r in refs if _internal(r, host))
        special = sum(1 for r in refs if _special(r))
        assert row.links_data.internal == internal
        assert row.links_data.special == special
        assert row.links_data.external == len(refs) - internal - special
        if refs:
            checked += 1
    assert checked > 0


def test_link_classes(docs):
    rel_hit = special_hit = 0
    for u, row in docs.items():
        links = _links(u)
        attrs = [_attrs(t) for t, _ in links]
        refs = [m for _, m in links]
        assert row.links_data.nofollow == sum("nofollow" in a for a in attrs)
        assert row.links_data.sponsored == sum("sponsored" in a for a in attrs)
        assert row.links_data.ugc == sum("ugc" in a for a in attrs)
        assert row.links_data.blank_target == sum("blank" in a for a in attrs)
        assert row.links_data.mailto == sum(r.startswith("mailto:") for r in refs)
        assert row.links_data.tel == sum(r.startswith("tel:") for r in refs)
        assert row.links_data.fragment == sum(r.startswith("#") for r in refs)
        assert row.links_data.javascript == sum(
            r.startswith("javascript:") for r in refs
        )
        host = u.split("/")[2]
        ext_domains = sorted(
            {
                r.split("://", 1)[1].split("/", 1)[0].lower()
                for r in refs
                if "://" in r and not _special(r) and not _internal(r, host)
            }
        )
        assert list(row.links_data.external_domains) == ext_domains
        anchors = [_anchor(t).lower() for t, _ in links]
        freq = dict(row.links_data.anchor_freq)
        assert freq == {a: anchors.count(a) for a in set(anchors)}
        if any(attrs):
            rel_hit += 1
        if any(_special(r) for r in refs):
            special_hit += 1
    assert rel_hit > 0 and special_hit > 0


# --- W8 images ---------------------------------------------------------------


def _dim(r, key):
    import re

    m = re.search(rf"[?&]{key}=(\d+)", r)
    return int(m.group(1)) if m else None


def test_images(docs):
    dim_hit = over_hit = 0
    for u, row in docs.items():
        imgs = [(t, m) for (k, t, m, o) in _spans(u) if k == "image"]
        refs = [m for _, m in imgs]
        assert row.images_data.total == len(refs)
        assert row.images_data.missing_alt == sum(1 for t, _ in imgs if not t)
        with_dims = [r for r in refs if _dim(r, "w") and _dim(r, "h")]
        assert row.images_data.with_dimensions == len(with_dims)
        over = sum(
            1
            for r in refs
            if (_dim(r, "w") or 0) > 1000 or (_dim(r, "h") or 0) > 1000
        )
        under = sum(
            1
            for r in refs
            if _dim(r, "w") and _dim(r, "h") and _dim(r, "w") < 100 and _dim(r, "h") < 100
        )
        assert row.images_data.oversized == over
        assert row.images_data.undersized == under
        # per-extension counts (images_worker.py:244-264)
        import re

        want_ext: dict[str, int] = {}
        for r in refs:
            m = re.search(r"(\.[A-Za-z0-9]+)([?#].*)?$", r)
            if m:
                want_ext[m.group(1).lower()] = want_ext.get(m.group(1).lower(), 0) + 1
        assert dict(row.images_data.extension_counts or {}) == want_ext, u
        if with_dims:
            dim_hit += 1
        if over:
            over_hit += 1
    assert dim_hit > 0 and over_hit > 0


# --- W5 directives -----------------------------------------------------------


def test_directives(docs):
    noidx_hit = ua_hit = 0
    for u, row in docs.items():
        robots = ",".join(_metas(u, "robots:"))
        assert row.directives_data.has_noindex == ("noindex" in robots)
        assert row.directives_data.is_indexable == ("noindex" not in robots)
        assert row.directives_data.has_noarchive == ("noarchive" in robots)
        if "unavailable_after:" in robots:
            want = robots.split("unavailable_after:")[1].split(",")[0].strip()
            assert row.directives_data.unavailable_after == want
            ua_hit += 1
        else:
            assert row.directives_data.unavailable_after is None
        if "noindex" in robots:
            noidx_hit += 1
    assert noidx_hit > 0 and ua_hit > 0


# --- W9 javascript -----------------------------------------------------------


def test_javascript(docs):
    fw_hit = inline_hit = 0
    for u, row in docs.items():
        scripts = [(t, m) for (k, t, m, o) in _spans(u) if k == "script"]
        ext = [(t, m) for t, m in scripts if m is not None]
        inline = [(t, m) for t, m in scripts if m is None]
        assert row.javascript_data.total == len(scripts)
        assert row.javascript_data.external == len(ext)
        assert row.javascript_data.inline == len(inline)
        assert row.javascript_data.async_count == sum(
            "async" in (t or "") for t, _ in ext
        )
        assert row.javascript_data.defer_count == sum(
            "defer" in (t or "") for t, _ in ext
        )
        rb = sum(
            1 for t, _ in ext if "async" not in (t or "") and "defer" not in (t or "")
        )
        assert row.javascript_data.render_blocking == rb
        ib = sum(len(t or "") for t, _ in inline)  # inline text IS the body
        assert row.javascript_data.inline_bytes == ib
        fws = sorted(
            name
            for name, sig in FRAMEWORK_SIGNATURES.items()
            if any(sig in m.lower() for _, m in ext)
        )
        assert list(row.javascript_data.frameworks) == fws
        assert row.javascript_data.spa_indicator == bool(
            set(_SPA_FRAMEWORKS) & set(fws)
        )
        if fws:
            fw_hit += 1
        if inline:
            inline_hit += 1
    assert fw_hit > 0 and inline_hit > 0


# --- W12 text metrics ---------------------------------------------------------


def test_text_metrics(docs):
    import re

    multi_sent_hit = 0
    for u, row in docs.items():
        texts = [t for (k, t, m, o) in _spans(u) if k in ("text", "heading", "title")]
        assert row.text_metrics.text_chars == sum(len(t) for t in texts)
        words = sum(len(t.split()) for t in texts)
        assert row.text_metrics.word_count == words
        assert row.text_metrics.span_count == len(_spans(u))
        assert row.text_metrics.paragraphs == sum(
            1 for (k, t, m, o) in _spans(u) if k == "text"
        )
        assert row.text_metrics.html_size == max(o for (k, t, m, o) in _spans(u))
        # sentence split on [.!?]+ (page_elements_worker.py:289-299)
        sents = sum(
            len([s for s in re.split(r"[.!?]+", t) if s.strip()]) for t in texts
        )
        assert row.text_metrics.sentence_count == sents
        # Spark F.round = HALF_UP over the exact binary double (Java
        # BigDecimal(double)); Decimal(float) reproduces that exactly,
        # Python's builtin round (banker's) does not
        from decimal import ROUND_HALF_UP, Decimal

        want_avg = (
            float(Decimal(words / sents).quantize(Decimal("0.1"), ROUND_HALF_UP))
            if sents
            else 0.0
        )
        assert row.text_metrics.avg_words_per_sentence == want_avg
        if sents > len(texts):
            multi_sent_hit += 1
    assert multi_sent_hit > 0


# --- W4 canonical -------------------------------------------------------------


def test_canonical(docs):
    hit = 0
    for u, row in docs.items():
        canons = [t.removeprefix("canonical: ") for t in _metas(u, "canonical:")]
        assert row.canonical_data.canonical_count == len(canons)
        if canons:
            assert row.canonical_data.canonical_url == canons[0]
            assert row.canonical_data.is_self_canonical == (canons[0] == u)
            hit += 1
    assert hit > 0


# --- W6 / W7 -----------------------------------------------------------------


def test_ga_analytics(docs):
    hit = 0
    for u, row in docs.items():
        ga = [
            m for (k, t, m, o) in _spans(u)
            if k == "script" and m and "googletagmanager" in m
        ]
        assert row.ga_analytics.has_analytics == bool(ga)
        if ga:
            assert all(i.startswith("G-") for i in row.ga_analytics.measurement_ids)
            hit += 1
    assert hit > 0


def test_hreflang(docs):
    hit = 0
    for u, row in docs.items():
        hl = _metas(u, "hreflang:")
        assert row.hreflang_data["count"] == len(hl)
        if hl:
            langs = {t.split()[1] for t in hl}
            assert set(row.hreflang_data.langs) == langs
            assert row.hreflang_data.invalid_lang_count == 0
            assert row.hreflang_data.has_self_reference  # synth hrefs start with url
            hit += 1
    assert hit > 0


# --- W11 mobile ---------------------------------------------------------------


def test_mobile_score(docs):
    """Full reference penalty table (mobile_worker.py:361-398) recomputed
    from the spans in pure Python — style bodies, element-attribute
    signals, viewport, plugins, separate-mobile link all load-bearing."""
    verdicts = set()
    hits = {k: 0 for k in ("tap", "font", "flash", "fixed", "inter", "tsa",
                           "sepm", "hscroll", "mq")}
    for u, row in docs.items():
        sp = _spans(u)
        vps = _metas(u, "viewport:")
        vp = vps[0].removeprefix("viewport: ") if vps else None
        css = "".join(t for (k, t, m, o) in sp if k == "style")
        els = [t for (k, t, m, o) in sp if k == "el"]
        mq = css.count("@media")
        responsive = (
            vp is not None and "width=device-width" in vp and "initial-scale=1" in vp
        ) or mq > 0
        tap = any(
            t.startswith("button|") and ("width: 2" in t or "height: 2" in t)
            for t in els
        ) or any(
            t.startswith("a|") and ("padding: 0" in t or "padding:0" in t)
            for t in els
        )
        font = any(
            x in t for t in els
            for x in ("font-size: 1", "font-size:1", "font-size: 0", "font-size:0")
        )
        fixed = (
            any(t.startswith("body|") and "width:" in t for t in els)
            or any(
                t.startswith("div|")
                and any(w in t for w in ("width: 9", "width: 10", "width: 11", "width: 12"))
                for t in els
            )
        ) and not responsive
        hscroll = any(
            t.startswith("body|")
            and any(x in t for x in ("overflow-x:visible", "overflow-x: visible",
                                     "overflow:visible", "overflow: visible"))
            for t in els
        )
        inter = any(
            "class=" in t
            and any(x in t for x in ("modal", "popup", "overlay", "interstitial"))
            for t in els
        )
        flash = any(
            t.startswith(("object|", "embed|")) and "flash" in t for t in els
        )
        tsadis = "text-size-adjust: none" in css or "text-size-adjust:none" in css
        zoom = vp is not None and "user-scalable=no" in vp
        sepm = bool(_metas(u, "altmobile:"))
        score = 100
        if vp is None:
            score -= 40
        elif not responsive:
            score -= 25
        score -= (15 * tap + 15 * font + 20 * flash + 20 * hscroll + 15 * fixed
                  + 10 * zoom + 10 * tsadis + 5 * sepm + 10 * inter)
        score = max(0, min(100, score))
        assert row.mobile_data.score == score, (u, vp, els, css[:80])
        want = "likely" if score >= 80 else "possibly" if score >= 60 else "unlikely"
        assert row.mobile_data.mobile_friendly == want
        assert row.mobile_data.is_responsive == responsive
        assert row.mobile_data.media_queries_count == mq
        assert row.mobile_data.tap_target_issues == tap
        assert row.mobile_data.font_size_issues == font
        assert row.mobile_data.fixed_width_layout == fixed
        assert row.mobile_data.horizontal_scrolling == hscroll
        assert row.mobile_data.possible_intrusive_interstitial == inter
        assert row.mobile_data.flash_used == flash
        assert row.mobile_data.separate_mobile_site == sepm
        assert row.mobile_data.has_amp_link == bool(_metas(u, "amphtml:"))
        want_plugins = [p for p, f in (("flash", flash), (
            "java",
            any(t.startswith("applet|") for t in els)
            or any(t.startswith("object|") and "java" in t for t in els),
        )) if f]
        assert list(row.mobile_data.plugins_used) == want_plugins
        verdicts.add(want)
        for key, val in (("tap", tap), ("font", font), ("flash", flash),
                         ("fixed", fixed), ("inter", inter), ("tsa", tsadis),
                         ("sepm", sepm), ("hscroll", hscroll), ("mq", mq > 0)):
            hits[key] += bool(val)
    assert len(verdicts) >= 2  # the corpus exercises several verdicts
    # every penalty surface must actually fire somewhere in the corpus
    assert all(v > 0 for v in hits.values()), hits


# --- W14 structured -----------------------------------------------------------


def test_structured(docs):
    md_hit = 0
    for u, row in docs.items():
        jl = [t.removeprefix("jsonld: ") for t in _metas(u, "jsonld:")]
        md = [t.removeprefix("microdata: ") for t in _metas(u, "microdata:")]
        assert row.structured_data.schema_count == len(jl) + len(md)
        assert list(row.structured_data.types) == sorted(set(jl + md))
        # all 15 reference flags (structured_worker.py:76-90)
        for typ, flag in _SCHEMA_FLAG_TYPES.items():
            assert row.structured_data[flag] == (typ in jl + md), (u, typ)
        if md:
            md_hit += 1
    assert md_hit > 0


# --- W15 third-party ----------------------------------------------------------


def test_third_party(docs):
    from crawler_distributed_spark.extract.spans import INLINE_JS_SIGNATURES

    prov_hit = cms_hit = theme_hit = inline_sig_hit = 0
    for u, row in docs.items():
        host = u.split("/")[2]
        ext = [
            m for (k, t, m, o) in _spans(u)
            if k == "script" and m and "://" in m and host not in m
        ]
        inljs = [t or "" for (k, t, m, o) in _spans(u) if k == "script" and m is None]
        assert row.third_party_services.third_party_scripts == len(ext)
        provs = sorted(
            name for name, sig in THIRD_PARTY_SIGNATURES.items()
            if any(sig in r for r in ext)
            or any(
                tok in b
                for tok in INLINE_JS_SIGNATURES.get(name, ())
                for b in inljs
            )
        )
        assert list(row.third_party_services.providers) == provs
        # inline-only detections (no src for the service on this page)
        src_only = {
            name for name, sig in THIRD_PARTY_SIGNATURES.items()
            if any(sig in r for r in ext)
        }
        if set(provs) - src_only:
            inline_sig_hit += 1
        refs = [m for (k, t, m, o) in _spans(u) if m]
        gen = _metas(u, "generator:")
        if gen:
            import re

            want = re.match(r"^([A-Za-z.]+)", gen[0].removeprefix("generator: ")).group(1)
            assert row.third_party_services.cms == want
            cms_hit += 1
        elif any("/wp-content/" in r for r in refs):
            # path-signature fallback (third_party_services_worker.py:561-610)
            assert row.third_party_services.cms == "WordPress"
        else:
            assert row.third_party_services.cms is None
        themes = [m for m in refs if "/wp-content/themes/" in m]
        if themes:
            assert row.third_party_services.wp_theme in themes[0]
            theme_hit += 1
        # class-token signals over the bodyclass meta (:154-175)
        bc = _metas(u, "bodyclass:")
        cls = bc[0].removeprefix("bodyclass: ") if bc else ""
        want_css = sorted(
            n for n, s in CSS_FRAMEWORK_SIGNATURES.items() if s in cls
        )
        want_bld = sorted(
            n for n, s in PAGE_BUILDER_SIGNATURES.items() if s in cls
        )
        assert list(row.third_party_services.css_frameworks) == want_css, u
        assert list(row.third_party_services.page_builders) == want_bld, u
        assert row.third_party_services.page_builder == (
            want_bld[0] if want_bld else None
        )
        if provs:
            prov_hit += 1
    assert prov_hit > 0 and cms_hit > 0 and theme_hit > 0
    # W15 gap closed: at least one service detected ONLY via its inline-JS
    # signature ('gtag(' / 'fbq(' / ...), not via any script src
    assert inline_sig_hit > 0


# --- W13 pagespeed ------------------------------------------------------------


def test_pagespeed_indicator_flags(docs):
    """W13 performance indicators (pagespeed_worker.py:347-413), including
    the minified-CSS/JS heuristics over <style> and inline-script bodies
    (:369-386: joined content with ≤5 lines and >500 chars)."""
    minjs_hit = mincss_hit = inline_min_hit = 0
    for u, row in docs.items():
        sp = _spans(u)
        ext = [m for (k, t, m, o) in sp if k == "script" and m]
        inljs = [t or "" for (k, t, m, o) in sp if k == "script" and m is None]
        styles = [t or "" for (k, t, m, o) in sp if k == "style"]
        rb = sum(
            1
            for (k, t, m, o) in sp
            if k == "script" and m and "async" not in (t or "") and "defer" not in (t or "")
        )
        imgs = [m for (k, t, m, o) in sp if k == "image"]
        with_dims = [r for r in imgs if _dim(r, "w") and _dim(r, "h")]
        n_res = sum(1 for (k, t, m, o) in sp if k in ("script", "image", "video"))
        css = "\n".join(styles)
        want_min_css = bool(styles) and len(css.split("\n")) <= 5 and len(css) > 500
        js = "\n".join(inljs)
        inline_min = bool(inljs) and len(js.split("\n")) <= 5 and len(js) > 500
        want_min_js = inline_min or any(".min.js" in r for r in ext)
        assert row.pagespeed_data.has_minified_css == want_min_css, u
        assert row.pagespeed_data.has_minified_js == want_min_js, u
        assert row.pagespeed_data.has_render_blocking_resources == (rb > 0)
        assert row.pagespeed_data.has_unoptimized_images == (
            len(imgs) > len(with_dims)
        )
        assert row.pagespeed_data.has_excessive_dom_size == (len(sp) > 1500)
        assert row.pagespeed_data.has_large_network_payloads == (n_res > 50)
        minjs_hit += want_min_js
        mincss_hit += want_min_css
        inline_min_hit += inline_min
    assert minjs_hit > 0  # the framework CDNs serve .min.js
    assert mincss_hit > 0  # minified single-line style bodies exist
    assert inline_min_hit > 0  # and minified INLINE js (not just .min.js src)


def test_pagespeed(docs):
    for u, row in docs.items():
        n_scripts = sum(1 for (k, t, m, o) in _spans(u) if k == "script")
        n_images = sum(1 for (k, t, m, o) in _spans(u) if k == "image")
        assert row.pagespeed_data.scripts == n_scripts
        assert row.pagespeed_data.images == n_images
        # no headers column in this fixture -> compression unknown
        assert row.pagespeed_data.compression is None
        assert row.pagespeed_data.is_compressed is False


# --- W18 uri ------------------------------------------------------------------


def test_uri_data(docs):
    for u, row in docs.items():
        path = u.split("://", 1)[1].split("/", 1)
        path = "/" + path[1] if len(path) > 1 else ""
        path = path.split("?")[0].split("#")[0]
        segs = [s for s in path.split("/") if s]
        assert row.uri_data.path == path, u
        assert row.uri_data.depth == len(segs)
        assert row.uri_data.has_query == ("?" in u)
        # synth canonical paths are clean: full readability
        assert row.uri_data.readability == 100
        assert row.uri_data.has_issues is False
        kws = sorted(
            {
                w
                for s in segs
                for w in __import__("re").split(r"[-_.]", s.lower())
                if len(w) > 3
            }
        )
        assert list(row.uri_data.seo_keywords) == kws


# --- response-header families (W4/W5/W13 header paths) ------------------------


def test_headers_directives(docs_h):
    hit = 0
    for u, row in docs_h.items():
        hdrs = dict(synth.response_headers_of(CFG, u))
        xr = ",".join(hdrs.get("x-robots-tag", []))
        assert row.directives_data.x_robots_tag == xr
        robots = ",".join(_metas(u, "robots:"))
        combined = robots + "," + xr
        assert row.directives_data.has_noindex == ("noindex" in combined)
        assert row.directives_data.is_indexable == ("noindex" not in combined)
        assert row.directives_data.has_noarchive == ("noarchive" in combined)
        if xr:
            hit += 1
    assert hit > 0


def test_headers_canonical(docs_h):
    hit = conflict_hit = 0
    for u, row in docs_h.items():
        hdrs = dict(synth.response_headers_of(CFG, u))
        link = ",".join(hdrs.get("link", []))
        want = None
        if 'rel="canonical"' in link:
            import re

            want = re.search(r'<([^>]*)>;\s*rel="canonical"', link).group(1)
        assert row.canonical_data.header_canonical == want
        canons = [t.removeprefix("canonical: ") for t in _metas(u, "canonical:")]
        conflict = bool(canons and want and canons[0] != want)
        assert row.canonical_data.header_html_conflict == conflict
        if want:
            hit += 1
        if conflict:
            conflict_hit += 1
    assert hit > 0 and conflict_hit > 0


def test_headers_pagespeed(docs_h):
    enc_hit = 0
    for u, row in docs_h.items():
        hdrs = dict(synth.response_headers_of(CFG, u))
        enc = ",".join(hdrs.get("content-encoding", []))
        assert row.pagespeed_data.compression == (enc or None)
        assert row.pagespeed_data.is_compressed == bool(enc)
        assert row.pagespeed_data.content_length == int(hdrs["content-length"][0])
        if enc:
            enc_hit += 1
    assert enc_hit > 0


def test_headers_hreflang(docs_h):
    """W7 header path: Link rel=alternate hreflang values merge with the
    HTML hreflang metas (hreflang_worker.py:51-383)."""
    import re

    hdr_hit = 0
    for u, row in docs_h.items():
        hdrs = dict(synth.response_headers_of(CFG, u))
        alts = [
            v for v in hdrs.get("link", [])
            if 'rel="alternate"' in v and "hreflang=" in v
        ]
        assert row.hreflang_data.header_count == len(alts)
        html_langs = {t.split()[1] for t in _metas(u, "hreflang:")}
        hdr_langs = {re.search(r'hreflang="([^"]+)"', v).group(1) for v in alts}
        assert set(row.hreflang_data.langs) == html_langs | hdr_langs
        assert row.hreflang_data["count"] == len(_metas(u, "hreflang:")) + len(alts)
        if alts:
            hdr_hit += 1
            # header alternates point at ?hl= variants of the same URL
            assert row.hreflang_data.has_self_reference
    assert hdr_hit > 0
