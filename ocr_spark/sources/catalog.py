"""Named catalog (metastore) over snapshot tables + metadata tables.

sources/snapshot.py gives one table Iceberg-style commit semantics;
this module is the CATALOG layer above it, mirroring the public
Iceberg catalog surface (REST/Hive catalog + the `history`/
`snapshots`/`files` metadata tables) without the runtime jar:

  * a metastore directory maps ``namespace.table`` names to table
    locations: ``<root>/<ns>/<tbl>/catalog.json`` holds the pointer +
    properties, ``<root>/<ns>/<tbl>/table/`` is the SnapshotTable
    (create-exclusive JSON write, so two concurrent ``create_table``
    calls cannot both win)
  * metadata TABLES are DataFrames, queryable like Iceberg's
    ``tbl$history`` / ``tbl$snapshots`` / ``tbl$files``:
      - history:   one row per retained snapshot with the operation
                   that produced it (append / rollback / compact)
      - snapshots: the raw manifest view (data dirs, partition specs)
      - files:     one row per committed parquet data file with
                   row-count / size / row-group stats read from the
                   parquet FOOTERS BY THE EXECUTORS (sc.parallelize
                   over the file list + mapPartitions), not the
                   driver — at 100 TB the footer scan is millions of
                   files, exactly the listing a real catalog amortizes
                   into manifest files; the distributed form keeps the
                   driver out of the hot path, and the file LIST
                   itself comes from the manifest (committed dirs
                   only), never a blind recursive walk of data/
  * ``register`` publishes a table into the Spark SQL namespace as
    temp views — ``<view>``, ``<view>__history``, ``<view>__files``,
    ``<view>__snapshots`` (Spark view names cannot carry Iceberg's
    ``$`` convention, so metadata views use a ``__`` suffix) — after
    which plain ``spark.sql`` joins over extraction output work with
    no ocr_spark import on the query side.

The reference service has no catalog (documents arrive per-request,
ref main.go:85-121); this layer exists for the 100 TB batch shape the
north rule targets, where jobs address tables by NAME and no path
literal survives into query code.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from .snapshot import SnapshotTable

_NAME_RE = re.compile(r"^[a-z0-9_]+$")


def _split_name(name: str) -> tuple[str, str]:
    parts = name.split(".")
    if len(parts) == 1:
        parts = ["default", parts[0]]
    if len(parts) != 2 or not all(_NAME_RE.match(p) for p in parts):
        raise ValueError(
            f"bad table name {name!r}: want [a-z0-9_]+ or "
            f"namespace.table in that alphabet")
    return parts[0], parts[1]


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _entry_path(self, ns: str, tbl: str) -> str:
        return os.path.join(self.root, ns, tbl, "catalog.json")

    # ---- table lifecycle ----

    def create_table(self, name: str,
                     properties: dict | None = None) -> SnapshotTable:
        ns, tbl = _split_name(name)
        entry = self._entry_path(ns, tbl)
        os.makedirs(os.path.dirname(entry), exist_ok=True)
        location = os.path.join(self.root, ns, tbl, "table")
        doc = {"namespace": ns, "table": tbl, "location": location,
               "created_at": time.time(), "properties": properties or {}}
        tmp = entry + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, entry)  # create-exclusive: concurrent creates race safely
        except FileExistsError:
            raise ValueError(f"table {ns}.{tbl} already exists") from None
        finally:
            os.unlink(tmp)
        return SnapshotTable(location)

    def load_table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self._describe(name)["location"])

    def _describe(self, name: str) -> dict:
        ns, tbl = _split_name(name)
        try:
            with open(self._entry_path(ns, tbl)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(f"no such table: {ns}.{tbl}") from None

    def table_exists(self, name: str) -> bool:
        ns, tbl = _split_name(name)
        return os.path.exists(self._entry_path(ns, tbl))

    def create_if_absent(self, name: str) -> SnapshotTable:
        if self.table_exists(name):
            return self.load_table(name)
        try:
            return self.create_table(name)
        except ValueError:
            return self.load_table(name)  # lost a concurrent create race

    def list_tables(self, namespace: str | None = None) -> list[dict]:
        out = []
        spaces = ([namespace] if namespace is not None
                  else sorted(d for d in os.listdir(self.root)
                              if os.path.isdir(os.path.join(self.root, d))))
        for ns in spaces:
            ns_dir = os.path.join(self.root, ns)
            if not os.path.isdir(ns_dir):
                continue
            for tbl in sorted(os.listdir(ns_dir)):
                entry = self._entry_path(ns, tbl)
                if os.path.exists(entry):
                    with open(entry) as f:
                        out.append(json.load(f))
        return out

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Remove the catalog entry; ``purge`` also deletes the data.
        Without purge the table directory stays on disk (Iceberg's
        drop-without-purge contract) and the name can be re-created
        pointing at fresh state."""
        ns, tbl = _split_name(name)
        doc = self._describe(name)
        os.unlink(self._entry_path(ns, tbl))
        if purge:
            shutil.rmtree(doc["location"], ignore_errors=True)

    # ---- SQL registration ----

    def register(self, spark: SparkSession, name: str,
                 view: str | None = None) -> str:
        """Publish the table + its metadata tables as temp views.
        Returns the data view's name (default: the table part)."""
        table = self.load_table(name)
        view = view or _split_name(name)[1]
        df = table.read(spark)
        if df is None:
            raise ValueError(f"table {name} has no committed snapshot yet")
        df.createOrReplaceTempView(view)
        history_df(spark, table).createOrReplaceTempView(f"{view}__history")
        snapshots_df(spark, table).createOrReplaceTempView(f"{view}__snapshots")
        files_df(spark, table).createOrReplaceTempView(f"{view}__files")
        return view


# ---------------------------------------------------------------------------
# Metadata tables
# ---------------------------------------------------------------------------

def _operation(snap: dict) -> str:
    if "rolled_back_to" in snap:
        return "rollback"
    if "compacted_from" in snap:
        return "compact"
    return "append"


def history_df(spark: SparkSession, table: SnapshotTable) -> DataFrame:
    """One row per retained snapshot (Iceberg ``history``): sequence,
    operation, rows, dir count, commit wall-clock."""
    rows = [(s["sequence"], _operation(s), s["committed_rows"],
             len(s["data_dirs"]), float(s["wall_clock"]),
             s.get("rolled_back_to"), s.get("compacted_from"))
            for s in table.snapshots()]
    return spark.createDataFrame(
        rows, "sequence INT, operation STRING, committed_rows BIGINT, "
              "n_data_dirs INT, wall_clock DOUBLE, rolled_back_to INT, "
              "compacted_from INT")


def snapshots_df(spark: SparkSession, table: SnapshotTable) -> DataFrame:
    """The raw manifest view (Iceberg ``snapshots``): per snapshot, its
    data dirs and each dir's partition spec."""
    rows = [(s["sequence"], s["data_dirs"],
             {k: ",".join(v) for k, v in s.get("specs", {}).items()},
             s["committed_rows"])
            for s in table.snapshots()]
    return spark.createDataFrame(
        rows, "sequence INT, data_dirs ARRAY<STRING>, "
              "specs MAP<STRING,STRING>, committed_rows BIGINT")


def _footer_scan(paths_with_meta):
    """mapPartitions kernel: read parquet footers executor-side."""
    import pyarrow.parquet as pq

    for run_id, partition_json, path in paths_with_meta:
        try:
            size = os.path.getsize(path)
            md = pq.ParquetFile(path).metadata
            yield (path, run_id, partition_json, size,
                   md.num_rows, md.num_row_groups, None)
        except Exception as e:  # footer unreadable: surface, don't kill
            yield (path, run_id, partition_json,
                   os.path.getsize(path) if os.path.exists(path) else 0,
                   None, None, f"{type(e).__name__}: {e}")


def files_df(spark: SparkSession, table: SnapshotTable,
             as_of: int | None = None) -> DataFrame:
    """One row per committed data FILE (Iceberg ``files``): run dir,
    Hive partition values, byte size, footer row/row-group counts.

    The file list comes from the snapshot's committed dirs (the
    manifest — never a blind walk of data/, which may hold in-flight
    uncommitted runs), and the footers are read by EXECUTORS: the
    driver ships only paths."""
    snap = (table.snapshot_at(as_of) if as_of is not None
            else table.current_snapshot())
    entries: list[tuple[str, str, str]] = []
    for run_id in (snap["data_dirs"] if snap else []):
        run_dir = os.path.join(table.data_root, run_id)
        for dirpath, _, names in os.walk(run_dir):
            rel = os.path.relpath(dirpath, run_dir)
            parts = dict(seg.split("=", 1) for seg in rel.split(os.sep)
                         if "=" in seg)
            for n in sorted(names):
                if n.endswith(".parquet"):
                    entries.append((run_id, json.dumps(parts, sort_keys=True),
                                    os.path.join(dirpath, n)))
    schema = ("file_path STRING, run_id STRING, partition_json STRING, "
              "size_bytes BIGINT, row_count BIGINT, n_row_groups INT, "
              "error STRING")
    if not entries:
        return spark.createDataFrame([], schema)
    slices = min(len(entries), spark.sparkContext.defaultParallelism * 2)
    rdd = spark.sparkContext.parallelize(entries, slices).mapPartitions(
        _footer_scan)
    return spark.createDataFrame(rdd, schema)
