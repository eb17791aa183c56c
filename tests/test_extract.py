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


def test_uri_data(docs):
    for u, row in docs.items():
        path = u.split("://", 1)[1].split("/", 1)
        path = "/" + path[1] if len(path) > 1 else ""
        path = path.split("?")[0].split("#")[0]
        segs = [s for s in path.split("/") if s]
        assert row.uri_data.path == path, u
        assert row.uri_data.depth == len(segs)
        assert row.uri_data.has_query == ("?" in u)
