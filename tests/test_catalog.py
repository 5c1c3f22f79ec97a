"""Snapshot-catalog semantics: time travel, rollback, compaction,
expiry (the Iceberg maintenance story behind the north rule's
"resumable from Iceberg snapshot checkpoints")."""

import os

import pytest

from ocr_spark import schemas
from ocr_spark.sources import snapshot, synth


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)


def _urls(df):
    return {r["url"] for r in df.select("url").collect()}


def test_time_travel_reads_each_snapshot(spark, tmp_path):
    root = str(tmp_path / "tt")
    rows = synth.generate_rows(48)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:16]), root,
                                 run_id="r1", num_partitions=2)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:32]), root,
                                 run_id="r2", num_partitions=2)
    snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                 run_id="r3", num_partitions=2)
    table = snapshot.SnapshotTable(root)
    assert [s["sequence"] for s in table.snapshots()] == [1, 2, 3]
    assert table.read(spark, as_of=1).count() == 16
    assert table.read(spark, as_of=2).count() == 32
    assert table.read(spark).count() == 48
    # as_of=2 is exactly the first two runs' urls.
    assert _urls(table.read(spark, as_of=2)) == {r["url"] for r in rows[:32]}
    with pytest.raises(FileNotFoundError, match="retained history"):
        table.snapshot_at(99)


def test_rollback_moves_head_and_reopens_resume(spark, tmp_path):
    """Rollback publishes a NEW snapshot replicating the old state: the
    bad run's rows vanish from plain reads, its urls become uncommitted
    (so resume re-extracts them), and the bad snapshot stays readable
    via as_of until expired."""
    root = str(tmp_path / "rb")
    rows = synth.generate_rows(40)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:20]), root,
                                 run_id="good", num_partitions=2)
    snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                 run_id="bad", num_partitions=2)
    table = snapshot.SnapshotTable(root)
    assert table.read(spark).count() == 40

    snap = table.rollback(1)
    assert snap["sequence"] == 3  # history grows, never rewrites
    assert snap["rolled_back_to"] == 1
    assert table.read(spark).count() == 20
    assert _urls(table.read(spark)) == {r["url"] for r in rows[:20]}
    # The rolled-back state is still time-travelable.
    assert table.read(spark, as_of=2).count() == 40

    # The bad run's urls are uncommitted again: resume redoes exactly them.
    r = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                     run_id="redo", num_partitions=2)
    assert r["processed"] == 20
    assert table.read(spark).count() == 40
    assert _urls(table.read(spark)) == {r2["url"] for r2 in rows}


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    """Compaction rewrites N small per-run dirs into one sized dir:
    same rows, same resume semantics, fewer files; prior snapshots
    still time-travel to the old dirs."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "cp")
    rows = synth.generate_rows(48)
    for i in range(4):  # 4 micro-runs x 4 partitions = 16 small files
        snapshot.run_with_checkpoint(
            spark, _df(spark, rows[i * 12:(i + 1) * 12]), root,
            run_id=f"micro{i}", num_partitions=4)
    table = snapshot.SnapshotTable(root)
    before = table.read(spark)
    files_before = before.select(F.input_file_name()).distinct().count()
    urls_before = _urls(before)

    snap = table.compact(spark, run_id="compacted", num_partitions=2)
    assert snap["compacted_from"] == 4
    assert snap["data_dirs"] == ["compacted"]
    after = table.read(spark)
    files_after = after.select(F.input_file_name()).distinct().count()
    assert files_after < files_before
    assert after.count() == 48
    assert _urls(after) == urls_before

    # Resume still sees every url as committed: full input is a no-op.
    r = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                     run_id="post", num_partitions=2)
    assert r["processed"] == 0

    # Pre-compact snapshots still read the old dirs.
    assert table.read(spark, as_of=2).count() == 24


def test_compact_refuses_stale_head(spark, tmp_path, monkeypatch):
    """A commit landing between compaction's read and publish must make
    the publish refuse (a stale replace would drop the concurrent
    run's rows)."""
    root = str(tmp_path / "race")
    rows = synth.generate_rows(24)
    snapshot.run_with_checkpoint(spark, _df(spark, rows[:12]), root,
                                 run_id="a", num_partitions=2)
    table = snapshot.SnapshotTable(root)

    real_publish = snapshot.SnapshotTable._publish

    def racing_publish(self, new, run_id):
        if run_id == "cmp":  # sneak a commit in before the compaction's
            snapshot.run_with_checkpoint(  # publish takes its sequence
                spark, _df(spark, rows), root, run_id="b", num_partitions=2)
        return real_publish(self, new, run_id)

    monkeypatch.setattr(snapshot.SnapshotTable, "_publish", racing_publish)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        table.compact(spark, run_id="cmp", num_partitions=1)
    monkeypatch.undo()
    # Nothing lost: both runs' rows are still the head.
    assert table.read(spark).count() == 24


def test_expire_snapshots_reclaims_only_unreferenced_dirs(spark, tmp_path):
    root = str(tmp_path / "exp")
    rows = synth.generate_rows(36)
    for i in range(3):
        snapshot.run_with_checkpoint(
            spark, _df(spark, rows[i * 12:(i + 1) * 12]), root,
            run_id=f"m{i}", num_partitions=2)
    table = snapshot.SnapshotTable(root)
    table.compact(spark, run_id="cmp", num_partitions=2)

    # An in-flight (uncommitted) dir must survive expiry untouched.
    orphan = table.run_dir("inflight")
    os.makedirs(orphan)

    out = table.expire_snapshots(keep_last=1)
    assert out["removed_manifests"] == 3
    assert sorted(out["removed_dirs"]) == ["m0", "m1", "m2"]
    assert os.path.isdir(orphan)
    assert not os.path.isdir(table.run_dir("m0"))

    # Head still reads; expired history raises a clear error.
    assert table.read(spark).count() == 36
    with pytest.raises(FileNotFoundError, match="expire_snapshots"):
        table.read(spark, as_of=2)
    # Resume across expiry: everything stays committed.
    r = snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                     run_id="post", num_partitions=2)
    assert r["processed"] == 0


def test_concurrent_append_retries_past_taken_sequence(tmp_path):
    """Two appenders racing to the same sequence: the loser's commit
    retries on the new head instead of clobbering (create-exclusive
    publish)."""
    table = snapshot.SnapshotTable(str(tmp_path / "cc"))
    table.commit("base", 5)

    real_publish = snapshot.SnapshotTable._publish
    fired = {"done": False}

    def racing_publish(self, new, run_id):
        if run_id == "slow" and not fired["done"]:
            fired["done"] = True  # "fast" wins sequence 2 first
            real_publish(self, {**new, "data_dirs": ["base", "fast"],
                                "committed_rows": 8}, "fast")
        return real_publish(self, new, run_id)

    import unittest.mock as mock
    with mock.patch.object(snapshot.SnapshotTable, "_publish",
                           racing_publish):
        snap = table.commit("slow", 3)
    assert snap["sequence"] == 3
    assert snap["data_dirs"] == ["base", "fast", "slow"]
    assert snap["committed_rows"] == 11  # fast's 8 + slow's 3


def test_compact_partitioned_output_round_trip(spark, tmp_path):
    """Compacting INTO a partition spec records spec+schema in the
    replace manifest and reads back identically."""
    root = str(tmp_path / "cps")
    rows = synth.generate_rows(32)
    snapshot.run_with_checkpoint(spark, _df(spark, rows), root,
                                 run_id="flat", num_partitions=2)
    table = snapshot.SnapshotTable(root)
    table.compact(spark, run_id="bydoc", partition_by=["doc_type"])
    assert table.partition_specs() == {"bydoc": ["doc_type"]}
    after = table.read(spark)
    assert after.count() == 32
    assert after.filter(after.doc_type.isNull()).count() == 0
