"""Crawl-pipeline operators: HTML main-text extraction and URL/domain
analytics over WARC records — the glue between ``sources.warc_records``
and the text-quality/dedup operators (CCNet/RefinedWeb shape). Additive
vs the reference (no crawl route; Assignment-python.py stops at image
color analytics).

Scale shape: extraction is an Arrow-batched stateless pass (zero
shuffle, embarrassingly parallel — the codec-gate class); URL parts are
the JVM built-in ``parse_url`` (whole-stage codegen, never a Python
round-trip); host blocklists broadcast the SMALL blocked set as a LEFT
ANTI join (the ngram max_df discipline — never ship the kept corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _html_struct():
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    link = StructType(
        [StructField("href", StringType()), StructField("anchor", StringType())]
    )
    return StructType(
        [
            StructField("text", StringType()),
            StructField("title", StringType()),
            StructField("links", ArrayType(link)),
            StructField("html_ok", BooleanType()),
        ]
    )


def html_extract(
    df: DataFrame,
    html_col: str = "http_body",
    out_col: str = "page",
) -> DataFrame:
    """Append ``out_col`` = struct<text, title, links, html_ok> extracted
    from an HTML string/binary column via :func:`functions.html.parse_html`
    (deterministic contract: script/style/head dropped, entities decoded,
    block boundaries -> newlines, whitespace collapsed).

    mapInPandas with every input column carried through verbatim — the
    one Python hop in the crawl pipeline; downstream stats (lengths,
    word counts, link counts) stay JVM-side expressions over the struct.
    Undecodable/None rows survive with html_ok = false and NULL fields
    (dead-letter discipline, never a dropped row)."""
    from pyspark.sql.types import StructField, StructType

    from ..functions.html import parse_html

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, _html_struct())]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for raw in pdf[html_col]:
                try:
                    if raw is None:
                        raise ValueError("no content")
                    if isinstance(raw, (bytes, bytearray)):
                        raw = bytes(raw).decode("utf-8", "replace")
                    r = parse_html(raw)
                    vals.append(
                        {
                            "text": r["text"],
                            "title": r["title"],
                            "links": [
                                {"href": h, "anchor": a} for h, a in r["links"]
                            ],
                            "html_ok": True,
                        }
                    )
                except Exception:
                    vals.append(
                        {"text": None, "title": None, "links": None,
                         "html_ok": False}
                    )
            out = pdf.copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(mapper, out_schema)


def with_url_parts(
    df: DataFrame, url_col: str = "target_uri", prefix: str = "url_"
) -> DataFrame:
    """Append ``{prefix}scheme/host/path/query`` parsed from a URL column
    — JVM ``parse_url`` expressions (codegen, NULL on malformed input),
    never a Python UDF."""
    u = F.col(url_col)
    return df.select(
        "*",
        F.parse_url(u, F.lit("PROTOCOL")).alias(f"{prefix}scheme"),
        F.parse_url(u, F.lit("HOST")).alias(f"{prefix}host"),
        F.parse_url(u, F.lit("PATH")).alias(f"{prefix}path"),
        F.parse_url(u, F.lit("QUERY")).alias(f"{prefix}query"),
    )


def url_query_param(url_col: str, key: str) -> Column:
    """The value of one query parameter (JVM parse_url 3-arg form)."""
    return F.parse_url(F.col(url_col), F.lit("QUERY"), F.lit(key))


def filter_blocked_hosts(
    df: DataFrame, blocklist: DataFrame | list[str], host_col: str = "url_host"
) -> DataFrame:
    """Drop rows whose host is on a blocklist — broadcast LEFT ANTI on
    the (small, bounded) blocked set; the page corpus is never shuffled
    or broadcast. Accepts a one-column DataFrame or a literal list."""
    if isinstance(blocklist, list):
        spark = df.sparkSession
        blocked = spark.createDataFrame(
            [(h,) for h in blocklist], f"{host_col} string"
        )
    else:
        blocked = blocklist.toDF(host_col)
    return df.join(F.broadcast(blocked), host_col, "left_anti")
