"""Web-page side-table operators: DOM-derived columns computed next to
(not inside) the main extraction pipeline, the html counterpart of
multimodal.pdf_layout_boxes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

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
