"""Named catalog (metastore) + Iceberg-style metadata tables
(sources/catalog.py): table lifecycle by NAME, history/snapshots/files
as queryable DataFrames, SQL registration."""

import os

import pytest

from ocr_spark import schemas
from ocr_spark.sources import catalog as cat
from ocr_spark.sources import snapshot, synth


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)


class TestLifecycle:
    def test_name_validation(self, tmp_path):
        c = cat.Catalog(str(tmp_path))
        for bad in ("a.b.c", "Upper.case", "sp ace", "", "a-b.c"):
            with pytest.raises(ValueError, match="bad table name"):
                c.create_table(bad)

    def test_create_load_list_drop(self, tmp_path):
        c = cat.Catalog(str(tmp_path))
        t1 = c.create_table("web.docs", properties={"owner": "ingest"})
        c.create_table("web.pairs")
        c.create_table("bare")  # default namespace
        assert c.table_exists("web.docs")
        assert not c.table_exists("web.nope")
        # duplicate create refuses; create_if_absent reuses
        with pytest.raises(ValueError, match="already exists"):
            c.create_table("web.docs")
        assert c.create_if_absent("web.docs").root == t1.root
        names = [(e["namespace"], e["table"]) for e in c.list_tables()]
        assert names == [("default", "bare"), ("web", "docs"), ("web", "pairs")]
        assert [e["table"] for e in c.list_tables("web")] == ["docs", "pairs"]
        props = [e for e in c.list_tables("web") if e["table"] == "docs"][0]
        assert props["properties"] == {"owner": "ingest"}
        # load of a missing name is a clean error
        with pytest.raises(ValueError, match="no such table"):
            c.load_table("web.nope")

    def test_drop_purge_semantics(self, tmp_path):
        c = cat.Catalog(str(tmp_path))
        t = c.create_table("web.docs")
        marker = os.path.join(t.root, "snapshots")
        assert os.path.isdir(marker)
        # drop WITHOUT purge: name gone, data stays (Iceberg contract)
        c.drop_table("web.docs")
        assert not c.table_exists("web.docs")
        assert os.path.isdir(marker)
        # purge removes the data too
        c.create_table("web.docs")
        c.drop_table("web.docs", purge=True)
        assert not os.path.isdir(marker)


class TestMetadataTables:
    @pytest.fixture()
    def populated(self, spark, tmp_path):
        """A catalog table with: flat run (16 docs), partitioned run
        (16 more), a rollback to seq 1."""
        c = cat.Catalog(str(tmp_path / "ms"))
        table = c.create_table("web.docs")
        rows = synth.generate_rows(32)
        snapshot.run_with_checkpoint(spark, _df(spark, rows[:16]),
                                     table.root, run_id="r1",
                                     num_partitions=2)
        snapshot.run_with_checkpoint(spark, _df(spark, rows), table.root,
                                     run_id="r2", num_partitions=2,
                                     partition_by=["doc_type"])
        table.rollback(1, run_id="undo")
        return c, table

    def test_history_operations(self, spark, populated):
        _, table = populated
        hist = cat.history_df(spark, table).orderBy("sequence").collect()
        assert [(h["sequence"], h["operation"]) for h in hist] == [
            (1, "append"), (2, "append"), (3, "rollback")]
        assert hist[2]["rolled_back_to"] == 1
        assert hist[2]["committed_rows"] == hist[0]["committed_rows"] == 16
        assert hist[1]["committed_rows"] == 32

    def test_snapshots_specs(self, spark, populated):
        _, table = populated
        snaps = {r["sequence"]: r for r in
                 cat.snapshots_df(spark, table).collect()}
        assert snaps[2]["data_dirs"] == ["r1", "r2"]
        assert snaps[2]["specs"] == {"r2": "doc_type"}
        assert snaps[3]["data_dirs"] == ["r1"]  # rollback view

    def test_files_footers_and_partitions(self, spark, populated):
        _, table = populated
        # At seq 2 (before rollback): files from both runs; footer
        # row counts must sum to the snapshot's committed rows.
        files = cat.files_df(spark, table, as_of=2).collect()
        assert all(f["error"] is None for f in files)
        assert sum(f["row_count"] for f in files) == 32
        assert all(f["size_bytes"] > 0 for f in files)
        by_run = {f["run_id"] for f in files}
        assert by_run == {"r1", "r2"}
        # Partitioned run's files carry their Hive partition values.
        r2 = [f for f in files if f["run_id"] == "r2"]
        assert all("doc_type" in f["partition_json"] for f in r2)
        assert any('"doc_type": "salary_slip"' in f["partition_json"]
                   for f in r2)
        flat = [f for f in files if f["run_id"] == "r1"]
        assert all(f["partition_json"] == "{}" for f in flat)
        # Head (post-rollback) lists only r1's files.
        head = cat.files_df(spark, table).collect()
        assert {f["run_id"] for f in head} == {"r1"}
        assert sum(f["row_count"] for f in head) == 16

    def test_files_empty_table(self, spark, tmp_path):
        c = cat.Catalog(str(tmp_path))
        t = c.create_table("web.empty")
        assert cat.files_df(spark, t).count() == 0


class TestSqlRegistration:
    def test_register_views(self, spark, tmp_path):
        c = cat.Catalog(str(tmp_path / "ms"))
        table = c.create_table("web.docs")
        rows = synth.generate_rows(24)
        snapshot.run_with_checkpoint(spark, _df(spark, rows), table.root,
                                     run_id="r1", num_partitions=2)
        view = c.register(spark, "web.docs")
        assert view == "docs"
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT doc_type) AS t FROM docs"
        ).collect()[0]
        assert got["n"] == 24 and got["t"] > 1
        # metadata views join against the data view's lineage columns
        per_file = spark.sql("""
            SELECT h.operation, f.row_count
            FROM docs__files f CROSS JOIN docs__history h
            WHERE h.sequence = 1
        """).collect()
        assert all(r["operation"] == "append" for r in per_file)
        assert sum(r["row_count"] for r in per_file) == 24
        snaps = spark.sql(
            "SELECT sequence, committed_rows FROM docs__snapshots").collect()
        assert [(s["sequence"], s["committed_rows"]) for s in snaps] == [(1, 24)]
        # registering an empty table is a clean error
        c.create_table("web.empty")
        with pytest.raises(ValueError, match="no committed snapshot"):
            c.register(spark, "web.empty")
