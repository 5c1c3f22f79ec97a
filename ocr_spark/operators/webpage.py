"""Web-page side-table operators: DOM-derived columns computed next to
(not inside) the main extraction pipeline, the html counterpart of
multimodal.pdf_layout_boxes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

PAGE_META_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("title", StringType(), True),
    StructField("description", StringType(), True),
    StructField("author", StringType(), True),
    StructField("published", StringType(), True),
    StructField("canonical", StringType(), True),
    StructField("sitename", StringType(), True),
])


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..textlib.charset import sniff_decode
    from ..textlib.webmeta import extract_metadata
    cols = [f.name for f in PAGE_META_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"], pdf["html"]):
            if html is None:
                continue
            # Same charset sniff as the extraction cascade, so the
            # metadata side table never disagrees with the extracted
            # text on a non-UTF-8 page.
            m = extract_metadata(sniff_decode(bytes(html))[0])
            rows.append((url, m["title"], m["description"], m["author"],
                         m["published"], m["canonical"], m["sitename"]))
        yield pd.DataFrame(rows, columns=cols)


def page_metadata(docs: DataFrame,
                  num_partitions: int | None = None) -> DataFrame:
    """Trafilatura-style page metadata (textlib/webmeta.py) for every
    row of ``docs`` (columns: url, html BINARY). One output row per
    page with a non-null html payload."""
    if num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("url"))
    return docs.mapInPandas(_meta_batches, schema=PAGE_META_SCHEMA)


JSONLD_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("jsonld_type", StringType(), True),
    StructField("name", StringType(), True),
    StructField("headline", StringType(), True),
    StructField("author", StringType(), True),
    StructField("date_published", StringType(), True),
    StructField("item_url", StringType(), True),
    StructField("_jsonld_skipped", IntegerType(), True),
])


def _jsonld_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..textlib.charset import sniff_decode
    from ..textlib.jsonld import extract_jsonld
    cols = [f.name for f in JSONLD_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"], pdf["html"]):
            if html is None:
                continue
            nodes, skipped = extract_jsonld(sniff_decode(bytes(html))[0])
            if skipped:
                # the sitemap/feed counter contract: ONE bookkeeping
                # row per lossy page, node rows carry 0
                rows.append((url, None, None, None, None, None, None,
                             skipped))
            for n in nodes:
                rows.append((url, n["jsonld_type"], n["name"],
                             n["headline"], n["author"],
                             n["date_published"], n["item_url"], 0))
        yield pd.DataFrame(rows, columns=cols)


def structured_data(docs: DataFrame,
                    num_partitions: int | None = None) -> DataFrame:
    """schema.org JSON-LD nodes (textlib/jsonld.py) for every page —
    one row per embedded node, SUM(_jsonld_skipped) = unparseable
    blocks. Same single-Arrow-pass shape as page_metadata; pages with
    no JSON-LD contribute no rows."""
    if num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("url"))
    return docs.mapInPandas(_jsonld_batches, schema=JSONLD_SCHEMA)
