"""Iceberg-style snapshot table over Parquet: atomic commits + resume.

No Iceberg runtime jar ships with this pyspark install (SURVEY.md §7),
so this module provides the minimal snapshot semantics the north rule
needs, shaped so a real Iceberg catalog drops in behind the same API:

  * data files live under  <root>/data/<run_id>/  (written by Spark)
  * a snapshot is a JSON manifest listing ALL committed data dirs;
    manifests are numbered and committed by atomic rename, so readers
    never observe a partial commit
  * readers union only committed dirs -> a crashed run's orphan data
    dir is invisible and simply re-done on resume
  * resume = LEFT ANTI join of the input on committed urls;
    the url probe reads ONLY the url column (Parquet column pruning
    keeps this cheap even when rows carry multi-MB blobs)
  * each run may carry a PARTITION SPEC (Iceberg's partition-spec +
    spec-evolution semantics): the spec is recorded per data dir in
    the manifest, a doc_type-scoped read prunes whole partition
    directories at the scan (a 100 TB corpus holds millions of
    salary-slip files a bank-statement consumer never lists), and a
    NEW run may commit under a DIFFERENT spec — readers unionByName
    per-dir, so old data never rewrites when the layout evolves
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession

_SNAP_RE = re.compile(r"^snap-(\d{6})\.json$")


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_root = os.path.join(root, "data")
        self.snap_root = os.path.join(root, "snapshots")
        os.makedirs(self.data_root, exist_ok=True)
        os.makedirs(self.snap_root, exist_ok=True)

    # ---- snapshot bookkeeping ----

    def _snapshots(self) -> list[tuple[int, str]]:
        out = []
        for name in os.listdir(self.snap_root):
            m = _SNAP_RE.match(name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.snap_root, name)))
        return sorted(out)

    def current_snapshot(self) -> dict | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        with open(snaps[-1][1]) as f:
            return json.load(f)

    def committed_dirs(self) -> list[str]:
        snap = self.current_snapshot()
        if snap is None:
            return []
        return [os.path.join(self.data_root, d) for d in snap["data_dirs"]]

    def partition_specs(self) -> dict[str, list[str]]:
        """run_id -> partition columns for every committed data dir
        (absent entries — pre-spec manifests — mean unpartitioned)."""
        snap = self.current_snapshot()
        return dict((snap or {}).get("specs", {}))

    def commit(self, run_id: str, rows: int,
               partition_by: list[str] | None = None,
               schema_json: str | None = None) -> dict:
        """Commit <root>/data/<run_id> into a new snapshot (atomic rename).
        ``partition_by`` records the dir's partition spec in the
        manifest — specs may differ across runs (spec evolution).
        ``schema_json`` records the dir's DataFrame schema (Iceberg
        manifests carry schemas for the same reason): readers of a
        partitioned dir use it instead of Hive partition-column type
        INFERENCE, which would silently turn a string partition value
        like '0423' into int 423."""
        snap = self.current_snapshot()
        prev_dirs = snap["data_dirs"] if snap else []
        prev_seq = snap["sequence"] if snap else 0
        if run_id in prev_dirs:
            return snap  # already committed: commit is idempotent per run
        specs = dict((snap or {}).get("specs", {}))
        if partition_by:
            specs[run_id] = list(partition_by)
        schemas = dict((snap or {}).get("schemas", {}))
        if schema_json:
            schemas[run_id] = schema_json
        new = {
            "sequence": prev_seq + 1,
            "data_dirs": prev_dirs + [run_id],
            "specs": specs,
            "schemas": schemas,
            "committed_rows": (snap["committed_rows"] if snap else 0) + rows,
            "wall_clock": time.time(),
        }
        final = os.path.join(self.snap_root, f"snap-{new['sequence']:06d}.json")
        tmp = final + f".tmp-{run_id}"
        with open(tmp, "w") as f:
            json.dump(new, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        return new

    # ---- reads ----

    def read(self, spark: SparkSession) -> DataFrame | None:
        # ONE manifest read: dirs/specs/schemas must come from the same
        # snapshot, or a commit landing mid-call could hand us snapshot
        # N's dir list with N+1's specs (a newly-partitioned dir would
        # then scan through the flat branch, missing its partition
        # column).
        snap = self.current_snapshot()
        if snap is None:
            return None
        run_ids = snap["data_dirs"]
        specs = snap.get("specs", {})
        schemas = snap.get("schemas", {})
        dirs = [os.path.join(self.data_root, d) for d in run_ids]
        if not any(specs.get(r) for r in run_ids):
            # All dirs flat: one multi-path scan (single file listing).
            return spark.read.parquet(*dirs)
        # Spec evolution: partition columns live in DIRECTORY names, so
        # each dir needs its own partition discovery; unionByName
        # realigns the column order partitionBy moved (partition cols
        # read back last). Partition pruning still applies per scan —
        # a doc_type filter skips whole directories of partitioned
        # dirs and falls back to row-group stats on flat ones. The
        # manifest-recorded schema replaces Hive partition-column type
        # inference (string '0423' must not come back as int 423).
        from pyspark.sql.types import StructType
        parts = []
        for rid, d in zip(run_ids, dirs):
            reader = spark.read
            if rid in schemas:
                reader = reader.schema(
                    StructType.fromJson(json.loads(schemas[rid])))
            parts.append(reader.parquet(d))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def processed_urls(self, spark: SparkSession) -> DataFrame | None:
        df = self.read(spark)
        return None if df is None else df.select("url")

    def remaining_input(self, spark: SparkSession, input_df: DataFrame) -> DataFrame:
        """Anti-join the input on committed urls (idempotent resume)."""
        done = self.processed_urls(spark)
        if done is None:
            return input_df
        return input_df.join(done, "url", "left_anti")

    def run_dir(self, run_id: str) -> str:
        return os.path.join(self.data_root, run_id)


def run_with_checkpoint(spark: SparkSession, input_df: DataFrame, root: str,
                        run_id: str, num_partitions: int | None = None,
                        partition_by: list[str] | None = None) -> dict:
    """One resumable pass: anti-join -> extract -> write -> atomic commit.

    Returns {'processed': n, 'snapshot': seq}. A rerun after a crash
    between write and commit redoes only the uncommitted work; a rerun
    after commit processes nothing.

    ``partition_by`` (e.g. ["doc_type"]) lays the run's data dir out
    Hive-partitioned and records the spec in the manifest: downstream
    doc_type-scoped reads become directory-pruned scans. Low-
    cardinality columns only — doc_type is ~7 values, so the dir fans
    out into at most 7 x num_partitions files, while a high-cardinality
    spec would shatter the table into per-row files.
    """
    from ..plans.pipeline import run_extraction

    table = SnapshotTable(root)
    snap = table.current_snapshot()
    if snap and run_id in snap["data_dirs"]:
        # Re-using a committed run_id would overwrite its data dir with
        # only the new rows while the manifest (and committed_rows) still
        # references the old contents — silent data loss. Refuse.
        raise ValueError(
            f"run_id {run_id!r} is already committed in this snapshot "
            f"table; pick a fresh run id (committed: {snap['data_dirs']})")
    remaining = table.remaining_input(spark, input_df)
    extracted = run_extraction(spark, remaining, run_id=run_id,
                               num_partitions=num_partitions)
    out_dir = table.run_dir(run_id)
    writer = extracted.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)
    # Explicit schema on the count-back: a fully-resumed (empty) input
    # under partitionBy writes NO files at all, and schema inference
    # on the bare dir would throw where the flat layout returned an
    # empty frame.
    n = spark.read.schema(extracted.schema).parquet(out_dir).count()
    if n == 0:
        # Nothing new: don't grow the snapshot chain.
        return {"processed": 0,
                "snapshot": (table.current_snapshot() or {}).get("sequence", 0)}
    snap = table.commit(run_id, n, partition_by=partition_by,
                        schema_json=extracted.schema.json()
                        if partition_by else None)
    return {"processed": n, "snapshot": snap["sequence"]}
