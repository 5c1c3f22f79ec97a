"""Structured Streaming ingest: incremental extraction with exactly-once
snapshot commits.

The reference is a stateless request/response service (SURVEY.md §2.8:
no streaming operators exist), so the streaming surface here is the
batch pipeline lifted into an incremental file-ingest job: new parquet
files landing under an input directory flow through the same salted
mapInArrow extraction via foreachBatch, and each micro-batch commits
atomically to the snapshot table — the anti-join makes redelivered
files idempotent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..sources.snapshot import SnapshotTable, run_with_checkpoint


def stream_extract(spark: SparkSession, input_dir: str, table_root: str,
                   checkpoint_dir: str, available_now: bool = True):
    """readStream over the input dir -> foreachBatch(extract + commit).

    available_now=True drains what exists and stops (test/backfill mode);
    False runs continuously on a real cluster.
    """
    stream = (
        spark.readStream.schema(schemas.INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        run_with_checkpoint(spark, batch_df, table_root,
                            run_id=f"stream-{batch_id:08d}")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return SnapshotTable(table_root)
    return writer.start()


def stream_exact_dedup(spark: SparkSession, input_dir: str, out_dir: str,
                       checkpoint_dir: str, available_now: bool = True,
                       watermark_delay: str | None = None,
                       max_files_per_trigger: int | None = None):
    """Dedup-on-ingest: exact dedup ACROSS micro-batches via Spark's
    built-in stateful streaming dropDuplicates — one occurrence of each
    content hash flows through, every redelivery in a LATER micro-batch
    is dropped by the state store. (Within one micro-batch the surviving
    row is whichever Spark sees first — content-level dedup matches the
    batch operator exactly, row-level survivor choice does not carry
    batch ``exact_dedup``'s deterministic min-id rule.)

    Spark-first shape: no custom state handling — ``dropDuplicates`` on
    a streaming DataFrame keeps one state-store entry per distinct key
    (here a 128-bit content hash, so state is ~16 bytes x distinct docs
    regardless of document size; at corpus scale back the store with
    RocksDB via spark.sql.streaming.stateStore.providerClass). With
    ``watermark_delay`` set (e.g. "24 hours") the key space is bounded:
    rows carry their ``warc_ts`` event time and
    ``dropDuplicatesWithinWatermark`` evicts state older than the
    delay — the standard trade (bounded state, duplicates further
    apart than the horizon pass through). Rows with NULL ``warc_ts``
    are assigned the processing time as their event time (a NULL would
    otherwise be silently DELETED by the watermark comparison, not
    passed through). Without a watermark, state grows with distinct
    docs — right for bounded backfills, documented cost for unbounded
    streams.

    The hash is ``textstats.fingerprint`` — the SAME expression batch
    ``exact_dedup`` groups on (md5 over whitespace-normalized lowercased
    text; NULL text hashes NULL, and NULL keys group together in both
    engines' semantics) — so a streaming ingest keeps exactly the
    content set a batch pass over the same files would.
    """
    from ..operators.textstats import fingerprint

    reader = spark.readStream.schema(schemas.INPUT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(input_dir)
              .withColumn("content_hash", fingerprint(F.col("text"))))
    if watermark_delay is not None:
        deduped = (stream
                   .withColumn("_evt", F.coalesce(F.col("warc_ts"),
                                                  F.current_timestamp()))
                   .withWatermark("_evt", watermark_delay)
                   .dropDuplicatesWithinWatermark(["content_hash"])
                   .drop("_evt"))
    else:
        deduped = stream.dropDuplicates(["content_hash"])
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        # Explicit schema: a no-op drain (nothing new under the
        # checkpoint) writes no files, and inference on the bare/absent
        # sink would throw where an empty frame is the right answer.
        out_schema = deduped.schema
        import os as _os
        if not _os.path.isdir(out_dir):
            return spark.createDataFrame([], out_schema)
        return spark.read.schema(out_schema).parquet(out_dir)
    return writer.start()
