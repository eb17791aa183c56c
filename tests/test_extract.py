"""Extraction families (extract/spans.py) vs a pure-Python span oracle."""

import pytest

from crawler_distributed_spark import synth
from crawler_distributed_spark.extract.spans import parse_docs

CFG = synth.SynthConfig(n_hosts=3, pages_base=25, hot_factor=2, branching=5)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for u in synth.all_urls(CFG):
        spans = synth.spans_of(CFG, u)
        if not spans:
            continue
        host = u.split("/")[2]
        rows.append(
            (
                synth.doc_id_of(u),
                u,
                host,
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans
                ],
            )
        )
    df = spark.createDataFrame(
        rows,
        "doc_id string, url_norm string, host string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    parsed = parse_docs(df)
    by_url = {r["url_norm"]: r for r in parsed.collect()}
    return by_url


def _spans(u):
    return synth.spans_of(CFG, u)


def test_page_title(docs):
    for u, row in docs.items():
        titles = [t for (k, t, m, o) in _spans(u) if k == "title"]
        assert row.page_title.title == titles[0]
        assert row.page_title.title_length == len(titles[0])
        assert row.page_title.title_count == len(titles)


def test_meta_description(docs):
    for u, row in docs.items():
        descs = [
            t for (k, t, m, o) in _spans(u) if k == "meta" and t.startswith("description:")
        ]
        want = descs[0] if descs else None
        assert row.meta_description.meta_description == want


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


def test_links(docs):
    checked = 0
    for u, row in docs.items():
        refs = [m for (k, t, m, o) in _spans(u) if k == "link"]
        host = u.split("/")[2]
        assert row.links_data.total == len(refs)
        assert row.links_data.unique == len(set(refs))
        internal = [
            r
            for r in refs
            if r.startswith(f"https://{host}")
            or r.startswith(f"http://{host}")
            or "://" not in r
        ]
        assert row.links_data.internal == len(internal)
        assert row.links_data.external == len(refs) - len(internal)
        if refs:
            checked += 1
    assert checked > 0


def test_images_and_scripts(docs):
    for u, row in docs.items():
        imgs = [m for (k, t, m, o) in _spans(u) if k == "image"]
        scripts = [m for (k, t, m, o) in _spans(u) if k == "script"]
        assert row.images_data.total == len(imgs)
        assert row.javascript_data.total == len(scripts)


def test_directives(docs):
    for u, row in docs.items():
        robots = ",".join(
            t for (k, t, m, o) in _spans(u) if k == "meta" and t.startswith("robots:")
        )
        assert row.directives_data.has_noindex == ("noindex" in robots)
        assert row.directives_data.is_indexable == ("noindex" not in robots)


def test_text_metrics(docs):
    for u, row in docs.items():
        texts = [t for (k, t, m, o) in _spans(u) if k in ("text", "heading", "title")]
        assert row.text_metrics.text_chars == sum(len(t) for t in texts)
        assert row.text_metrics.word_count == sum(len(t.split()) for t in texts)
        assert row.text_metrics.span_count == len(_spans(u))


def _metas(u, prefix):
    return [t for (k, t, m, o) in _spans(u) if k == "meta" and t.startswith(prefix)]


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


def test_mobile_and_structured(docs):
    vp_hit = sd_hit = 0
    for u, row in docs.items():
        has_vp = bool(_metas(u, "viewport:"))
        assert row.mobile_data.has_viewport == has_vp
        if has_vp:
            assert row.mobile_data.mobile_friendly == "likely"
            vp_hit += 1
        types = {t.removeprefix("jsonld: ") for t in _metas(u, "jsonld:")}
        assert set(row.structured_data.types) == types
        assert row.structured_data.has_product == ("Product" in types)
        if types:
            sd_hit += 1
    assert vp_hit > 0 and sd_hit > 0


def test_third_party_and_pagespeed(docs):
    hit = 0
    for u, row in docs.items():
        host = u.split("/")[2]
        ext = [
            m for (k, t, m, o) in _spans(u)
            if k == "script" and m and "://" in m and host not in m
        ]
        assert row.third_party_services.third_party_scripts == len(ext)
        if ext:
            hit += 1
        n_scripts = sum(1 for (k, t, m, o) in _spans(u) if k == "script")
        n_images = sum(1 for (k, t, m, o) in _spans(u) if k == "image")
        assert row.pagespeed_data.scripts == n_scripts
        assert row.pagespeed_data.images == n_images
    assert hit > 0


def test_uri_data(docs):
    for u, row in docs.items():
        path = u.split("://", 1)[1].split("/", 1)
        path = "/" + path[1] if len(path) > 1 else ""
        path = path.split("?")[0].split("#")[0]
        segs = [s for s in path.split("/") if s]
        assert row.uri_data.path == path, u
        assert row.uri_data.depth == len(segs)
        assert row.uri_data.has_query == ("?" in u)
