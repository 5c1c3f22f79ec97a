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
