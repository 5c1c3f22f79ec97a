"""Arrow-native extraction UDF (mapInArrow).

One pass over the input batches; the cheap-first cascade short-circuits
*inside* the UDF per row (SURVEY.md §4) so the blob column is scanned
once. Never a row-at-a-time Python UDF: batches cross the JVM/Python
boundary as Arrow record batches (north_rule / input_hint).

Why mapInArrow instead of mapInPandas: the output schema is 20 columns
with nested structs/arrays, and the pandas round-trip (list-of-dicts ->
object-dtype DataFrame -> Arrow) dominated the UDF stage wall (~5x the
pure-Python parser cost, measured). Building the output columns with
pyarrow directly is C-speed, and the url/warc_ts/lang/doc_type columns
pass through zero-copy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from .. import EXTRACTOR_VERSION, schemas
from ..operators.cascade import extract_record

# Per-doc-type result slots assembled column-wise.
_SLOTS = ("quality", "salary", "bank", "itr", "aadhaar", "pan", "dl",
          "employee", "appointment", "webpage")


def _arrow_schema():
    from pyspark.sql.pandas.types import to_arrow_schema
    return to_arrow_schema(schemas.EXTRACT_SCHEMA)


def extract_arrow_batches(iterator: Iterator[pa.RecordBatch],
                          run_id: str = "") -> Iterator[pa.RecordBatch]:
    """mapInArrow body: input batches of INPUT_SCHEMA (+ doc_type,
    password), output batches of EXTRACT_SCHEMA with per-row lineage."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    partition_id = tc.partitionId() if tc is not None else -1
    row_in_partition = 0
    out_schema = _arrow_schema()
    slot_types = {s: out_schema.field(s).type for s in _SLOTS}

    for batch in iterator:
        name_to_col = {n: batch.column(i)
                       for i, n in enumerate(batch.schema.names)}
        urls = name_to_col["url"].to_pylist()
        htmls = name_to_col["html"].to_pylist()
        texts = name_to_col["text"].to_pylist()
        doc_types = name_to_col["doc_type"].to_pylist()
        passwords = name_to_col["password"].to_pylist()
        n = len(urls)

        extracted: list[str] = []
        errors: list[str | None] = []
        input_bytes: list[int] = []
        slots: dict[str, list] = {s: [] for s in _SLOTS}
        for i in range(n):
            html = htmls[i]
            rec = extract_record(urls[i], html, texts[i] or "",
                                 doc_types[i], passwords[i] or "")
            extracted.append(rec["extracted_text"])
            errors.append(rec["error"])
            input_bytes.append(len(html) if html is not None else 0)
            for s in _SLOTS:
                slots[s].append(rec[s])

        def passthrough(name):
            col = name_to_col[name]
            want = out_schema.field(name).type
            return col if col.type == want else col.cast(want)

        arrays = [
            passthrough("url"),
            passthrough("warc_ts"),
            passthrough("lang"),
            passthrough("doc_type"),
            pa.array(extracted, type=pa.string()),
            *[pa.array(slots[s], type=slot_types[s]) for s in _SLOTS],
            pa.array(errors, type=pa.string()),
            pa.array([run_id] * n, type=pa.string()),
            pa.array([partition_id] * n, type=pa.int32()),
            pa.array(range(row_in_partition, row_in_partition + n),
                     type=pa.int64()),
            pa.array(input_bytes, type=pa.int64()),
            pa.array([EXTRACTOR_VERSION] * n, type=pa.string()),
        ]
        row_in_partition += n
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def make_extractor(run_id: str):
    """Bind run_id into a mapInArrow callable."""
    def fn(iterator: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        return extract_arrow_batches(iterator, run_id=run_id)
    return fn
