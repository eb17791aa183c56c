"""Fetch stage: vectorized Arrow UDF over the scheduled batch.

The reference fetches via Scrapy's downloader
(crawler/spider_project/spiders/base_spider.py:101-149); here fetch is a
``mapInPandas`` over the politeness-capped schedule. In the sandbox the
fetcher is the deterministic synthetic web (synth.py) — a pure function of
the URL, so executors need no shared state and no I/O; in production the
same operator body would issue batched HTTP requests per Arrow batch.

Emits one row per scheduled URL with status/content_type/doc_id, the raw
outlink array, and the interleaved span array (BASELINE.json input_hint
payload). Downstream splits this into fetched_docs rows, retry rows, and
outlink candidates — one pass, no refetch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import synth

_FETCH_RESULT_FIELDS = [
    T.StructField("status", T.IntegerType(), False),
    T.StructField("content_type", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("outlinks", T.ArrayType(T.StringType()), False),
    T.StructField(
        "spans",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), False),
                    T.StructField("text", T.StringType(), True),
                    T.StructField("media_ref", T.StringType(), True),
                    T.StructField("offset", T.IntegerType(), False),
                ]
            )
        ),
        False,
    ),
]


def fetch_scheduled(scheduled: DataFrame, cfg: synth.SynthConfig) -> DataFrame:
    """Append fetch-result columns to the scheduled batch."""
    out_schema = T.StructType(list(scheduled.schema.fields) + _FETCH_RESULT_FIELDS)

    def do_fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = pdf["url_norm"]
            pdf = pdf.copy()
            pdf["status"] = urls.map(lambda u: synth.status_of(cfg, u)).astype("int32")
            pdf["content_type"] = urls.map(lambda u: synth.content_type_of(cfg, u))
            pdf["doc_id"] = [
                synth.doc_id_of(u)
                if s == 200 and c == "text/html"
                else None
                for u, s, c in zip(urls, pdf["status"], pdf["content_type"])
            ]
            pdf["outlinks"] = urls.map(lambda u: synth.outlinks_of(cfg, u))
            pdf["spans"] = urls.map(
                lambda u: [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in synth.spans_of(cfg, u)
                ]
            )
            yield pdf

    return scheduled.mapInPandas(do_fetch, schema=out_schema)
