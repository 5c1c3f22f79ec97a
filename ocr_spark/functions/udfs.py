"""Arrow-vectorized extraction UDF (mapInPandas).

One pass over the input batches; the cheap-first cascade short-circuits
*inside* the UDF per row (SURVEY.md §4) so the blob column is scanned
once. Never a row-at-a-time Python UDF: batches cross the JVM/Python
boundary as Arrow record batches (north_rule / input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .. import EXTRACTOR_VERSION, schemas
from ..operators.cascade import extract_record

_OUT_COLUMNS = [f.name for f in schemas.EXTRACT_SCHEMA.fields]


def extract_batches(iterator: Iterator[pd.DataFrame],
                    run_id: str = "") -> Iterator[pd.DataFrame]:
    """mapInPandas body: input batches of INPUT_SCHEMA (+ doc_type),
    output batches of EXTRACT_SCHEMA with per-row lineage."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    partition_id = tc.partitionId() if tc is not None else -1
    row_in_partition = 0

    for pdf in iterator:
        out: list[dict] = []
        for url, warc_ts, html, text, lang, doc_type, password in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"],
                pdf["lang"], pdf["doc_type"], pdf["password"]):
            html_bytes = bytes(html) if html is not None else None
            rec = extract_record(url, html_bytes, text or "", doc_type,
                                 password or "")
            rec["warc_ts"] = warc_ts
            rec["lang"] = lang
            rec["run_id"] = run_id
            rec["partition_id"] = partition_id
            rec["row_in_partition"] = row_in_partition
            rec["input_bytes"] = len(html_bytes) if html_bytes is not None else 0
            rec["extractor_version"] = EXTRACTOR_VERSION
            row_in_partition += 1
            out.append(rec)
        yield pd.DataFrame(out, columns=_OUT_COLUMNS)


def make_extractor(run_id: str):
    """Bind run_id into a mapInPandas callable."""
    def fn(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return extract_batches(iterator, run_id=run_id)
    return fn
