"""ocr_spark — a PySpark-native document-extraction analytics engine.

A brand-new implementation (NOT a port) of the per-document extraction and
verification capabilities of the reference service `Aashish23092/ocr`,
re-expressed as a distributed batch pipeline over a Common-Crawl-style table

    (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

with Arrow-vectorized pandas UDFs for the scan-order parsers, Catalyst
column expressions for everything regex-mappable, explicit url-hash
salting for skew, per-partition lineage + metrics, and snapshot-checkpoint
idempotent resume.

Layout:
  textlib/    pure-Python parser core (exact reference semantics, no Spark)
  functions/  Catalyst expression forms + Arrow UDF wrappers
  operators/  extraction, cross-check joins, dedup, similarity, text stats
  sources/    synthetic input generator, payload codec, snapshot manifest
  plans/      end-to-end job assembly
"""

EXTRACTOR_VERSION = "0.1.0"
