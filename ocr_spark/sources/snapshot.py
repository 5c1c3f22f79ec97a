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
  * resume = LEFT ANTI join of the input on already-committed urls;
    the url probe reads ONLY the url column (Parquet column pruning
    keeps this cheap even when rows carry multi-MB blobs)
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

    def commit(self, run_id: str, rows: int) -> dict:
        """Commit <root>/data/<run_id> into a new snapshot (atomic rename)."""
        snap = self.current_snapshot()
        prev_dirs = snap["data_dirs"] if snap else []
        prev_seq = snap["sequence"] if snap else 0
        if run_id in prev_dirs:
            return snap  # already committed: commit is idempotent per run
        new = {
            "sequence": prev_seq + 1,
            "data_dirs": prev_dirs + [run_id],
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
        dirs = self.committed_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

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
                        run_id: str, num_partitions: int | None = None) -> dict:
    """One resumable pass: anti-join -> extract -> write -> atomic commit.

    Returns {'processed': n, 'snapshot': seq}. A rerun after a crash
    between write and commit redoes only the uncommitted work; a rerun
    after commit processes nothing.
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
    extracted.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    if n == 0:
        # Nothing new: don't grow the snapshot chain.
        return {"processed": 0,
                "snapshot": (table.current_snapshot() or {}).get("sequence", 0)}
    snap = table.commit(run_id, n)
    return {"processed": n, "snapshot": snap["sequence"]}
