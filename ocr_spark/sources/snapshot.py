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
  * the manifest chain is the CATALOG: every manifest is retained, so
    ``read(spark, as_of=N)`` time-travels to any past snapshot,
    ``rollback(N)`` publishes a NEW snapshot replicating N's state
    (history is never rewritten — Iceberg's rollback contract, so a
    bad run is undone by one metadata write and its urls become
    uncommitted again for the resume anti-join), ``compact()``
    rewrites the accumulated per-run small files into one sized dir
    behind a replace-snapshot (the 100 TB small-files maintenance
    path: a long-lived ingest accrues one dir per micro-run and file
    listing, not data volume, becomes the scan bottleneck), and
    ``expire_snapshots()`` reclaims data dirs referenced only by
    expired history
  * snapshots publish by hard-link (create-exclusive), not rename:
    two writers racing to the same sequence number cannot silently
    clobber each other — the loser gets EEXIST and retries on the
    new head (Iceberg's optimistic-concurrency commit)
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

    def snapshots(self) -> list[dict]:
        """Full retained history, oldest first (Iceberg's ``snapshots``
        metadata table). Sequences may start above 1 after
        ``expire_snapshots``."""
        out = []
        for _, path in self._snapshots():
            with open(path) as f:
                out.append(json.load(f))
        return out

    def snapshot_at(self, sequence: int) -> dict:
        path = os.path.join(self.snap_root, f"snap-{sequence:06d}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            have = [s for s, _ in self._snapshots()]
            raise FileNotFoundError(
                f"snapshot {sequence} is not in this table's retained "
                f"history (have {have}); it may have been removed by "
                f"expire_snapshots")

    def _publish(self, new: dict, run_id: str) -> None:
        """Create-exclusive publish of ``new`` as snap-<sequence>.
        Raises FileExistsError if that sequence was already taken by a
        concurrent writer (the caller decides: append commits recompute
        and retry; replace commits refuse)."""
        final = os.path.join(self.snap_root, f"snap-{new['sequence']:06d}.json")
        tmp = final + f".tmp-{run_id}"
        with open(tmp, "w") as f:
            json.dump(new, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-exclusive, unlike rename
        finally:
            os.unlink(tmp)

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
        while True:
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
            try:
                self._publish(new, run_id)
                return new
            except FileExistsError:
                # A concurrent writer took this sequence. Appending a new
                # data dir composes with whatever it committed: recompute
                # on the new head and retry (Iceberg's append-commit retry).
                continue

    def rollback(self, to_sequence: int, run_id: str = "rollback") -> dict:
        """Publish a NEW snapshot replicating ``to_sequence``'s state.

        History is never rewritten — the bad snapshots stay readable via
        ``as_of`` until expired — but the table HEAD moves back: rows
        committed after ``to_sequence`` disappear from plain reads and
        their urls become uncommitted again, so the next
        ``run_with_checkpoint`` re-extracts them (the one-metadata-write
        undo for a bad extractor release at 100 TB)."""
        old = self.snapshot_at(to_sequence)
        while True:
            head = self.current_snapshot()
            new = {
                "sequence": (head["sequence"] if head else 0) + 1,
                "data_dirs": list(old["data_dirs"]),
                "specs": dict(old.get("specs", {})),
                "schemas": dict(old.get("schemas", {})),
                "committed_rows": old["committed_rows"],
                "rolled_back_to": to_sequence,
                "wall_clock": time.time(),
            }
            try:
                self._publish(new, run_id)
                return new
            except FileExistsError:
                continue

    def compact(self, spark: SparkSession, run_id: str,
                num_partitions: int | None = None,
                partition_by: list[str] | None = None) -> dict:
        """Rewrite every committed data dir into ONE sized dir and
        publish a replace-snapshot pointing only at it.

        The maintenance path a long-lived ingest needs: micro-runs
        accrue one small dir each, and at catalog scale the scan cost
        becomes file LISTING, not bytes. Row content is unchanged
        (same committed_rows, same urls — resume semantics identical);
        prior snapshots still time-travel to the old dirs until
        ``expire_snapshots``. Optimistic concurrency: the rewrite is
        a function of the snapshot it read, so if another commit lands
        first the publish REFUSES (unlike append commits, a replace
        based on a stale head would drop the concurrent run's rows)."""
        base = self.current_snapshot()
        if base is None:
            raise ValueError("cannot compact an empty snapshot table")
        df = self.read(spark)
        if num_partitions:
            df = df.repartition(num_partitions)
        out_dir = self.run_dir(run_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_dir)
        n = spark.read.schema(df.schema).parquet(out_dir).count()
        if n != base["committed_rows"]:
            raise RuntimeError(
                f"compaction rewrote {n} rows but the base snapshot "
                f"committed {base['committed_rows']} — refusing to publish")
        new = {
            "sequence": base["sequence"] + 1,
            "data_dirs": [run_id],
            "specs": {run_id: list(partition_by)} if partition_by else {},
            "schemas": {run_id: df.schema.json()} if partition_by else {},
            "committed_rows": n,
            "compacted_from": base["sequence"],
            "wall_clock": time.time(),
        }
        try:
            self._publish(new, run_id)
        except FileExistsError:
            raise RuntimeError(
                f"a concurrent commit took sequence {new['sequence']} while "
                f"compacting; rerun compaction from the new head") from None
        return new

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` manifests and delete
        data dirs referenced ONLY by the dropped history.

        The reclaim half of compaction: after a compact the old per-run
        dirs stay on disk purely for time travel; expiring the
        pre-compact snapshots deletes them. Dirs referenced by any
        retained manifest are never touched, and dirs referenced by NO
        manifest are left alone too — they may be an in-flight run that
        has written its data but not yet committed."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self._snapshots()
        drop, keep = snaps[:-keep_last], snaps[-keep_last:]
        if not drop:
            return {"removed_manifests": 0, "removed_dirs": []}
        referenced = set()
        for _, path in keep:
            with open(path) as f:
                referenced.update(json.load(f)["data_dirs"])
        doomed = set()
        for _, path in drop:
            with open(path) as f:
                doomed.update(json.load(f)["data_dirs"])
        doomed -= referenced
        for _, path in drop:
            os.unlink(path)
        for rid in sorted(doomed):
            shutil.rmtree(os.path.join(self.data_root, rid),
                          ignore_errors=True)
        return {"removed_manifests": len(drop),
                "removed_dirs": sorted(doomed)}

    # ---- reads ----

    def read(self, spark: SparkSession,
             as_of: int | None = None) -> DataFrame | None:
        # ONE manifest read: dirs/specs/schemas must come from the same
        # snapshot, or a commit landing mid-call could hand us snapshot
        # N's dir list with N+1's specs (a newly-partitioned dir would
        # then scan through the flat branch, missing its partition
        # column). ``as_of`` time-travels: the table exactly as
        # snapshot ``as_of`` committed it, valid until that snapshot
        # is expired.
        snap = (self.snapshot_at(as_of) if as_of is not None
                else self.current_snapshot())
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
