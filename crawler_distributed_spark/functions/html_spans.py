"""Real-HTML → span-grammar parser (stdlib ``html.parser``, no bs4).

The engine's parse/extract stages (extract/spans.py, the W1-W18
families) consume the interleaved span grammar documented in synth.py —
(kind, text, media_ref, offset) rows where HTML structure is encoded in
fixed shapes ("h<level>: …" headings, "<anchor>|attrs" links, "<key>:
<value>" metas, raw bodies for style/inline-script). In the sandbox the
synthetic web EMITS that grammar directly; this module is the
production-path inverse: parse real HTML bytes into the identical
grammar so the whole downstream pipeline (admission outlinks, span
extraction, W-family workers) runs unchanged on live fetches.

Reference semantics provenance: the grammar shapes stand in for what the
reference's BeautifulSoup workers read from the DOM —
page_title_worker.py:166-177 (title + 10-prop OpenGraph),
headings_worker.py:167-245 (per-level headings), links extraction with
rel/target attrs, third_party_services_worker.py:44-175 (script srcs,
inline-JS bodies, body classes), mobile_worker.py:294-398 (element
style/class/type signals, viewport, separate-mobile link),
structured_worker.py:76-90 (JSON-LD @type, microdata itemtype).

Offsets are the running length of emitted span text (strictly
increasing, the input_hint's ordering contract); ties cannot occur
because every span advances the cursor by at least one.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from urllib.parse import urljoin

# element-signal surface (mobile_worker.py:294-355): tags whose style/
# class/type attributes the W11 penalty table inspects
_EL_STYLE_TAGS = frozenset({"button", "a", "span", "div", "body", "p"})
_EL_PLUGIN_TAGS = frozenset({"object", "embed", "applet"})
_META_NAME_KEYS = frozenset({"description", "viewport", "robots", "generator"})
_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_SKIP_LINK_SCHEMES = ("mailto:", "tel:", "javascript:", "#")


class _SpanParser(HTMLParser):
    """Capture frames are a STACK with one buffer per frame: nested
    captures (an <a> inside an <h1>) never clobber the parent's text,
    an end tag implicitly closes any frames opened above its own
    (real-world unclosed <a>), and close() drains whatever is still
    open — a dangling capture can't swallow the rest of the document."""

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.spans: list[tuple] = []
        self.links: list[str] = []
        self._cursor = 0  # NOT self.offset: ParserBase uses that internally
        self._frames: list[dict] = []        # open captures, each with own buf
        self._in_body_text: list[str] = []

    # -- emit helpers -------------------------------------------------
    def _emit(self, kind: str, text, ref=None):
        self.spans.append((kind, text, ref, self._cursor))
        self._cursor += max(1, len(text or "") + 1)

    def _flush_text(self):
        t = " ".join(" ".join(self._in_body_text).split())
        self._in_body_text = []
        if t:
            self._emit("text", t)

    def _push(self, kind: str, **extra):
        self._frames.append({"kind": kind, "buf": [], **extra})

    def _close_frame(self):
        fr = self._frames.pop()
        text = "".join(fr["buf"]).strip()
        kind = fr["kind"]
        if kind == "title":
            self._emit("title", " ".join(text.split()))
        elif kind in _HEADINGS:
            self._emit("heading", f"h{kind[1]}: " + " ".join(text.split()))
        elif kind == "a":
            anchor = " ".join(text.split())
            body = f"{anchor}|{fr['attrs']}" if fr["attrs"] else anchor
            self._emit("link", body, fr["ref"])
            if fr["ref"] and not fr["ref"].startswith(_SKIP_LINK_SCHEMES):
                self.links.append(fr["ref"])
            # anchor text stays visible to the enclosing capture / body
            # text (soup.get_text() semantics in the reference workers)
            if self._frames:
                self._frames[-1]["buf"].append(text)
            elif text:
                self._in_body_text.append(" ".join(text.split()))
        elif kind == "script":
            if fr["jsonld"]:
                try:
                    t = json.loads(text).get("@type")
                except Exception:
                    t = None
                if t:
                    self._emit("meta", f"jsonld: {t}")
            elif text:  # inline body (W15 signatures / W13 minified-JS)
                self._emit("script", text, None)
        elif kind == "style":
            if text:
                self._emit("style", text)

    # -- tag handling -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in ("p", "li", "br", "section", "article") or tag in _HEADINGS:
            # block boundary implicitly closes an open <a> (browser
            # tree-construction behavior; guards against unclosed <a>)
            while self._frames and self._frames[-1]["kind"] == "a":
                self._close_frame()
        if tag in ("p", "li", "br", "section", "article"):
            self._flush_text()
        if tag == "title":
            self._push("title")
        elif tag in _HEADINGS:
            self._flush_text()
            self._push(tag)
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content") or ""
            if name in _META_NAME_KEYS:
                self._emit("meta", f"{name}: {content}")
            elif prop.startswith("og:"):
                self._emit("meta", f"og:{prop[3:]}: {content}")
        elif tag == "link":
            rel = (a.get("rel") or "").lower()
            href = a.get("href") or ""
            if rel == "canonical":
                self._emit("meta", f"canonical: {urljoin(self.base, href)}")
            elif rel == "amphtml":
                self._emit("meta", f"amphtml: {urljoin(self.base, href)}")
            elif rel == "alternate" and a.get("hreflang"):
                self._emit(
                    "meta",
                    f"hreflang: {a['hreflang'].lower()} {urljoin(self.base, href)}",
                )
            elif rel == "alternate" and a.get("media"):
                # separate-mobile-site link (mobile_worker.py:361-372)
                self._emit("meta", f"altmobile: {urljoin(self.base, href)}")
        elif tag == "a":
            # a new <a> closes any still-open one (browsers never nest)
            while self._frames and self._frames[-1]["kind"] == "a":
                self._close_frame()
            self._flush_text()
            href = a.get("href") or ""
            ref = (
                href if href.startswith(_SKIP_LINK_SCHEMES)
                else urljoin(self.base, href)
            )
            toks = [t for t in re.split(r"[\s,]+", (a.get("rel") or "").lower()) if t]
            if (a.get("target") or "").lower() == "_blank":
                toks.append("blank")
            self._push("a", ref=ref, attrs=",".join(toks))
            if a.get("style"):
                self._emit("el", f"a|style={a['style']}")
        elif tag == "script":
            self._push(
                "script",
                jsonld=(a.get("type") or "").lower() == "application/ld+json",
            )
            src = a.get("src")
            if src:
                toks = [t for t in ("async", "defer") if t in a]
                if (a.get("type") or "").lower() == "module":
                    toks.append("module")
                self._emit(
                    "script", ",".join(toks) or None, urljoin(self.base, src)
                )
        elif tag == "style":
            self._push("style")
        elif tag == "img":
            src = urljoin(self.base, a.get("src") or "")
            w, h = a.get("width"), a.get("height")
            if w and h and str(w).isdigit() and str(h).isdigit():
                src += f"?w={w}&h={h}"
            self._emit("image", a.get("alt"), src)
        elif tag == "body":
            if a.get("class"):
                self._emit("meta", f"bodyclass: {a['class']}")
            if a.get("style"):
                self._emit("el", f"body|style={a['style']}")
        elif tag in _EL_PLUGIN_TAGS:
            if a.get("type"):
                self._emit("el", f"{tag}|type={a['type']}")
            elif a.get("code"):
                self._emit("el", f"{tag}|code={a['code']}")
        elif tag in _EL_STYLE_TAGS:
            if a.get("style"):
                self._emit("el", f"{tag}|style={a['style']}")
            elif tag == "div" and a.get("class") and re.search(
                r"\b(modal|overlay|interstitial|popup)\b", a["class"]
            ):
                self._emit("el", f"div|class={a['class']}")
        if a.get("itemtype"):
            # microdata itemtype → schema type suffix (structured_worker)
            self._emit("meta", f"microdata: {a['itemtype'].rstrip('/').rsplit('/', 1)[-1]}")

    def handle_endtag(self, tag):
        if not self._frames:
            if tag in ("p", "li", "section", "article", "body", "html"):
                self._flush_text()
            return
        # deepest frame this end tag closes; frames opened above it
        # (unclosed <a>/<script> in the wild) close implicitly first
        target = None
        for j in range(len(self._frames) - 1, -1, -1):
            if self._frames[j]["kind"] == tag:
                target = j
                break
        if target is None:
            return
        while len(self._frames) > target:
            self._close_frame()

    def handle_data(self, data):
        if self._frames:
            self._frames[-1]["buf"].append(data)
        elif data.strip():
            self._in_body_text.append(data.strip())

    def close(self):
        super().close()
        while self._frames:  # dangling captures at EOF still emit
            self._close_frame()
        self._flush_text()


def html_to_spans(html: str, base_url: str) -> tuple[list[tuple], list[str]]:
    """Parse real HTML into the span grammar. Returns (spans, outlinks):
    spans = [(kind, text, media_ref, offset), ...] with strictly
    increasing offsets; outlinks = absolute-resolved <a href> targets in
    document order (mailto/tel/fragment/javascript excluded — those stay
    visible to L2 link analysis via their link spans)."""
    p = _SpanParser(base_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is tolerant, but never let a pathological document
        # kill the fetch task — partial spans beat none
        pass
    return p.spans, p.links
