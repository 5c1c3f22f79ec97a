"""Idempotent snapshot-resume semantics (north_rule)."""

from ocr_spark import schemas
from ocr_spark.sources import snapshot, synth


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)


def test_resume_no_duplicates(spark, tmp_path):
    root = str(tmp_path / "tbl")
    all_rows = synth.generate_rows(64)

    # Run 1: first half only (simulates a partial ingest).
    r1 = snapshot.run_with_checkpoint(spark, _df(spark, all_rows[:32]), root,
                                      run_id="run1", num_partitions=4)
    assert r1["processed"] == 32
    assert r1["snapshot"] == 1

    # Run 2: full input -> only the second half is processed.
    r2 = snapshot.run_with_checkpoint(spark, _df(spark, all_rows), root,
                                      run_id="run2", num_partitions=4)
    assert r2["processed"] == 32
    assert r2["snapshot"] == 2

    table = snapshot.SnapshotTable(root)
    final = table.read(spark)
    urls = [r["url"] for r in final.select("url").collect()]
    assert len(urls) == 64
    assert len(set(urls)) == 64  # no duplicates
    assert set(urls) == {r["url"] for r in all_rows}

    # Run 3: nothing left -> no-op, snapshot chain unchanged.
    r3 = snapshot.run_with_checkpoint(spark, _df(spark, all_rows), root,
                                      run_id="run3", num_partitions=4)
    assert r3["processed"] == 0
    assert r3["snapshot"] == 2
    assert table.read(spark).count() == 64


def test_crash_before_commit_invisible(spark, tmp_path):
    """A data dir written without a commit must be invisible and be
    redone by the next run."""
    from ocr_spark.plans.pipeline import run_extraction

    root = str(tmp_path / "tbl2")
    rows = synth.generate_rows(16)
    table = snapshot.SnapshotTable(root)

    # Simulate a crash: write the run dir but never commit.
    extracted = run_extraction(spark, _df(spark, rows), run_id="crashed",
                               num_partitions=2)
    extracted.write.mode("overwrite").parquet(table.run_dir("crashed"))
    assert table.read(spark) is None  # invisible

    r = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                     run_id="retry", num_partitions=2)
    assert r["processed"] == 16
    final = table.read(spark)
    assert final.count() == 16
    assert final.select("url").distinct().count() == 16
    # Only the committed dir is read; the orphan stays orphaned.
    assert table.committed_dirs() == [table.run_dir("retry")]


def test_committed_run_id_reuse_refused(spark, tmp_path):
    """Passing a committed run_id with new input would overwrite that
    run's data dir while the manifest still references it (silent data
    loss) — the checkpoint pass must refuse instead."""
    import pytest

    root = str(tmp_path / "tbl4")
    rows = synth.generate_rows(24)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:12]), root,
                                 run_id="runX", num_partitions=2)
    with pytest.raises(ValueError, match="already committed"):
        snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                     run_id="runX", num_partitions=2)
    # The committed data is untouched.
    assert snapshot.SnapshotTable(root).read(spark).count() == 12


def test_commit_idempotent_per_run(tmp_path):
    table = snapshot.SnapshotTable(str(tmp_path / "tbl3"))
    s1 = table.commit("runA", 10)
    s2 = table.commit("runA", 10)  # re-commit of the same run: no-op
    assert s1["sequence"] == 1
    assert s2["sequence"] == 1
    assert table.current_snapshot()["committed_rows"] == 10


def test_partition_spec_round_trip_and_pruned_scan(spark, tmp_path):
    """A run committed with partition_by=["doc_type"] lays its data dir
    out Hive-partitioned: the spec lands in the manifest, the read
    returns the same rows as a flat run (order-insensitive), resume
    anti-join still sees its urls, and a doc_type-scoped read LISTS
    ONLY that partition's files (directory pruning — the 100 TB point
    of the spec)."""
    root = str(tmp_path / "tblp")
    rows = synth.generate_rows(48)
    r1 = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                      run_id="p1", num_partitions=2,
                                      partition_by=["doc_type"])
    assert r1["processed"] == 48
    table = snapshot.SnapshotTable(root)
    assert table.partition_specs() == {"p1": ["doc_type"]}

    final = table.read(spark)
    assert final.count() == 48
    assert {r["url"] for r in final.select("url").collect()} \
        == {r["url"] for r in rows}
    # doc_type survives as a (partition) column with its values intact.
    n_types = final.select("doc_type").distinct().count()
    assert n_types >= 2

    # Directory pruning: one doc_type's scan READS strictly fewer files
    # (input_file_name reflects post-pruning file access; inputFiles()
    # would list the whole relation).
    from pyspark.sql import functions as F
    one_type = final.select("doc_type").first()["doc_type"]
    all_files = final.select(F.input_file_name()).distinct().count()
    pruned_files = (final.filter(final.doc_type == one_type)
                    .select(F.input_file_name()).distinct().count())
    assert 0 < pruned_files < all_files

    # Resume still anti-joins on committed urls across the spec.
    r2 = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                      run_id="p2", num_partitions=2,
                                      partition_by=["doc_type"])
    assert r2["processed"] == 0


def test_partition_spec_evolution_unions_old_and_new(spark, tmp_path):
    """Spec evolution: run 1 commits FLAT, run 2 commits partitioned by
    doc_type — readers union both layouts by name without rewriting the
    old dir (Iceberg's spec-evolution contract)."""
    root = str(tmp_path / "tble")
    rows = synth.generate_rows(40)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:20]), root,
                                 run_id="flat", num_partitions=2)
    snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                 run_id="evolved", num_partitions=2,
                                 partition_by=["doc_type"])
    table = snapshot.SnapshotTable(root)
    assert table.partition_specs() == {"evolved": ["doc_type"]}
    final = table.read(spark)
    assert final.count() == 40
    assert {r["url"] for r in final.select("url").collect()} \
        == {r["url"] for r in rows}
    # Both layouts contribute and doc_type is non-null everywhere.
    assert final.filter(final.doc_type.isNull()).count() == 0
