"""Sitemap parsing, classification and scoring (SURVEY.md §2: S6, Q3, Q4).

Reference semantics:
- XML parse of <urlset>/<sitemapindex> with namespaces
  (lib/utils/sitemap_utils.py:200-371)
- page-vs-non-page sitemap classification by keyword
  (lib/utils/sitemap_utils.py:33-62, 124-166)
- URL scoring: priority + recency max(0, 1 - days/365) + changefreq bonus,
  sort desc, truncate to max_pages (lib/utils/sitemap_utils.py:374-433)

The parse runs as an Arrow-batched pandas UDF (stdlib ElementTree, no
network); scoring/classification are pure Column expressions with a FROZEN
clock column (the reference uses datetime.now() — SURVEY.md §4 determinism
substitution: the engine takes now_date as data)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

PAGE_KEYWORDS = ("page", "pages", "static", "content", "main", "post", "posts", "blog")
NON_PAGE_KEYWORDS = (
    "news", "newsletter", "newsletters", "newsletter-archive", "article",
    "articles", "category", "categories", "tag", "tags", "author", "authors",
    "archive", "taxonomy", "feed",
)

CHANGEFREQ_BONUS = {
    "always": 0.5, "hourly": 0.4, "daily": 0.3, "weekly": 0.2,
    "monthly": 0.1, "yearly": 0.05, "never": 0.0,
}

SITEMAP_ENTRY = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("changefreq", T.StringType(), True),
    ]
)

_PARSE_RESULT = T.StructType(
    [
        T.StructField("is_index", T.BooleanType(), False),
        T.StructField("child_sitemaps", T.ArrayType(T.StringType()), False),
        T.StructField("entries", T.ArrayType(SITEMAP_ENTRY), False),
    ]
)


def parse_sitemap_xml(content: str) -> dict:
    """Parse one sitemap document: <sitemapindex> → child sitemap URLs;
    <urlset> → url entries with metadata (defaults per reference:
    priority 0.5 when absent)."""
    out = {"is_index": False, "child_sitemaps": [], "entries": []}
    if not content:
        return out
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return out
    tag = root.tag
    if tag.endswith("sitemapindex"):
        out["is_index"] = True
        for sm in root.iter(f"{SITEMAP_NS}sitemap"):
            loc = sm.find(f"{SITEMAP_NS}loc")
            if loc is not None and loc.text:
                out["child_sitemaps"].append(loc.text.strip())
    elif tag.endswith("urlset"):
        for u in root.iter(f"{SITEMAP_NS}url"):
            loc = u.find(f"{SITEMAP_NS}loc")
            if loc is None or not loc.text:
                continue
            lastmod = u.find(f"{SITEMAP_NS}lastmod")
            prio = u.find(f"{SITEMAP_NS}priority")
            freq = u.find(f"{SITEMAP_NS}changefreq")
            out["entries"].append(
                {
                    "url": loc.text.strip(),
                    "lastmod": lastmod.text.strip() if lastmod is not None and lastmod.text else None,
                    "priority": float(prio.text) if prio is not None and prio.text else 0.5,
                    "changefreq": freq.text.strip() if freq is not None and freq.text else None,
                }
            )
    return out


@F.pandas_udf(_PARSE_RESULT)
def parse_sitemap_udf(content: pd.Series) -> pd.DataFrame:
    rows = [parse_sitemap_xml(c) for c in content.fillna("")]
    return pd.DataFrame(rows)


def filter_page_sitemaps(sitemap_urls: list[str]) -> tuple[list[str], bool]:
    """Q4: order child sitemaps page-class first, keep unclassified
    ('other') after them, DROP non-page ones — the reference's
    filter_page_sitemaps (lib/utils/sitemap_utils.py:124-166; keyword
    match over the full lowercased URL). Returns (ordered_urls,
    found_page_sitemaps)."""
    page, other = [], []
    for u in sitemap_urls:
        lu = u.lower()
        if any(kw in lu for kw in PAGE_KEYWORDS):
            page.append(u)
        elif not any(kw in lu for kw in NON_PAGE_KEYWORDS):
            other.append(u)
    return page + other, bool(page)


def robots_rules_from_txt(
    robots_txt: str | None, host: str, user_agent: str = "*"
) -> list[dict]:
    """Parse a REAL robots.txt body into the engine's (host, path_prefix,
    allow) gating rows for operators/admission.gate_robots.

    Standard group semantics: consecutive ``User-agent:`` lines open a
    group; its Allow/Disallow records apply when the group names ``*`` or
    our token. The gate is longest-prefix-match with default allow, which
    matches the robots spec for plain path prefixes; wildcard handling
    is strictly conservative TOWARD ALLOWING: a trailing ``*`` is a
    prefix no-op and is dropped, an Allow with a mid-pattern ``*`` is
    truncated at the wildcard (truncation only WIDENS an Allow), and a
    Disallow with a mid-pattern or leading ``*`` is skipped entirely —
    truncating it would widen the block (``Disallow: /*.php`` must not
    become ``Disallow: /``). The reference's effective posture is
    allow-everything (Scrapy ROBOTSTXT_OBEY=False, settings.py:61);
    this engine gates per the north rule, erring toward that posture
    on inexpressible rules."""
    rules: list[dict] = []
    current_uas: list[str] = []
    in_records = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_records:  # a records section ended -> new group begins
                current_uas = []
                in_records = False
            current_uas.append(val.lower())
        elif key in ("allow", "disallow"):
            in_records = True
            if "*" not in current_uas and user_agent.lower() not in current_uas:
                continue
            prefix = val.rstrip("*")  # trailing * is a prefix no-op
            if "*" in prefix:
                if key == "disallow":
                    continue  # inexpressible as a prefix; skipping = allow
                prefix = prefix.split("*", 1)[0]  # truncation only widens Allow
            if not prefix:
                continue  # empty Disallow: (allow-all) or leading-wildcard
            rules.append(
                {"host": host, "path_prefix": prefix, "allow": key == "allow"}
            )
    if not any(r["path_prefix"] == "/" for r in rules):
        rules.append({"host": host, "path_prefix": "/", "allow": True})
    return rules


def scan_robots_for_sitemaps(robots_txt: str) -> list[str]:
    """S5: extract ``Sitemap:`` directives from robots.txt
    (lib/utils/sitemap_utils.py:93-96 regex)."""
    import re

    if not robots_txt:
        return []
    return [
        m.group(1).strip()
        for m in re.finditer(r"(?i)Sitemap:\s*(https?://\S+)", robots_txt)
    ]


def locate_sitemap_url(robots_txt: str | None, domain: str) -> str:
    """S5: the reference's locate_sitemap_url (sitemap_utils.py:65-121):
    first robots.txt ``Sitemap:`` hit wins; otherwise fall back to the
    first common location (/sitemap.xml — in the synthetic web the first
    candidate always exists, standing in for the reference's HEAD probe
    over its 5-location list)."""
    found = scan_robots_for_sitemaps(robots_txt or "")
    if found:
        return found[0]
    return f"https://{domain}/sitemap.xml"


def classify_sitemap_col(url: Column) -> Column:
    """Q4: 'page' / 'non_page' / 'other' by filename keyword — page-like
    sitemaps are crawled first, non-page ones dropped
    (sitemap_utils.py:124-166)."""
    name = F.lower(F.regexp_extract(url, r"([^/]+)\.xml(\.gz)?$", 1))
    page_hit = F.lit(False)
    for kw in PAGE_KEYWORDS:
        page_hit = page_hit | name.contains(kw)
    non_hit = F.lit(False)
    for kw in NON_PAGE_KEYWORDS:
        non_hit = non_hit | name.contains(kw)
    # reference checks page keywords first (sitemap_utils.py:139-151)
    return (
        F.when(page_hit, F.lit("page"))
        .when(non_hit, F.lit("non_page"))
        .otherwise(F.lit("other"))
    )


def sitemap_score_col(
    priority: Column, lastmod: Column, changefreq: Column, now_date: Column
) -> Column:
    """Q3 scoring with frozen clock: score = priority
    + max(0, 1 - days_since_lastmod/365) + changefreq bonus."""
    # all accepted reference formats (%Y-%m-%dT%H:%M:%S[%f]%z, %Y-%m-%d)
    # carry the date in the first 10 chars; guard with a shape regex so
    # ANSI to_date never throws on junk
    lastmod_date = F.when(
        lastmod.rlike(r"^\d{4}-\d{2}-\d{2}($|T)"),
        F.to_date(F.substring(lastmod, 1, 10), "yyyy-MM-dd"),
    )
    days = F.datediff(now_date, lastmod_date)
    recency = F.when(
        lastmod_date.isNotNull(), F.greatest(F.lit(0.0), 1 - days / F.lit(365.0))
    ).otherwise(F.lit(0.0))
    bonus = F.lit(0.0)
    for freq, b in CHANGEFREQ_BONUS.items():
        bonus = F.when(changefreq == freq, F.lit(b)).otherwise(bonus)
    return priority + recency + bonus


def sitemap_score_py(
    priority: float, lastmod: str | None, changefreq: str | None, now_date: str
) -> float:
    """Pure-Python twin of sitemap_score_col — identical expression order
    so engine/oracle float results match bitwise."""
    import datetime as _dt
    import re as _re

    recency = 0.0
    if lastmod and _re.match(r"^\d{4}-\d{2}-\d{2}($|T)", lastmod):
        d = _dt.date.fromisoformat(lastmod[:10])
        days = (_dt.date.fromisoformat(now_date) - d).days
        recency = max(0.0, 1 - days / 365.0)
    bonus = CHANGEFREQ_BONUS.get(changefreq, 0.0) if changefreq else 0.0
    return priority + recency + bonus


def prioritize_sitemap_entries(
    entries_df, now_date: str, max_pages: int | None = None
):
    """Entries (url, lastmod, priority, changefreq) → scored + ranked,
    truncated to max_pages (sitemap_utils.py:374-433, frozen clock)."""
    scored = entries_df.withColumn(
        "score",
        sitemap_score_col(
            F.col("priority"), F.col("lastmod"), F.col("changefreq"),
            F.lit(now_date).cast("date"),
        ),
    ).orderBy(F.desc("score"), F.asc("url"))
    return scored.limit(max_pages) if max_pages else scored
