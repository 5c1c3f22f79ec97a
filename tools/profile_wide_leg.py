"""Profile the local[32] extraction leg: where does the demand gap
(cores_used ~15-20 of 32 threads) come from?

Hypotheses (VERDICT r2): python worker pool sizing, Arrow batch size,
or a straggler tail in the 2x-partitions task layout.

Method: run the SAME extraction job at local[32] over a materialized
cc-profile corpus with Spark's event log enabled, then decompose the
wall from SparkListenerTaskEnd events:

  * per-task durations of the mapInArrow stage -> straggler tail
    (p50/p90/max task duration; tail_s = stage wall - p90 task finish)
  * concurrency timeline reconstructed from task launch/finish times ->
    average running tasks over the stage (the JOB's own parallelism,
    independent of hypervisor delivery)
  * /proc/stat sampling thread -> delivered-cores timeline for the
    same window (demand vs grant, side by side)
  * python worker process count mid-run (pyspark.daemon children)

A --partitions sweep (default 64,128,256 at 32 threads) isolates the
task-layout hypothesis: if the tail shrinks as tasks get finer, the
gap is packing, not the worker pool.

Writes BENCH/wide_leg_profile.json + BENCH/wide_leg_profile.md.
Never run concurrently with another Spark job (timing purity).

Usage:
  python tools/profile_wide_leg.py                 # 192k docs, local[32]
  python tools/profile_wide_leg.py --docs 96000 --partitions 64,128
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def busy_cores_sampler(stop, samples):
    def busy():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals) - vals[3] - vals[4], time.perf_counter()

    hz = os.sysconf("SC_CLK_TCK")
    j0, t0 = busy()
    while not stop.is_set():
        time.sleep(0.25)
        j1, t1 = busy()
        samples.append((round(t1, 3), round((j1 - j0) / hz / (t1 - t0), 2)))
        j0, t0 = j1, t1


def count_python_workers() -> int:
    out = subprocess.run(["ps", "-eo", "cmd"], capture_output=True,
                         text=True).stdout
    return sum(1 for ln in out.splitlines() if "pyspark.daemon" in ln)


def parse_event_log(log_dir: str) -> list[dict]:
    """Task rows of the LARGEST stage (the mapInArrow extract stage) from
    the newest event-log file."""
    entries = sorted(glob.glob(f"{log_dir}/*"), key=os.path.getmtime)
    newest = entries[-1]
    # Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_<app>/
    # events_1_<app>, ...); single-file logs are the legacy layout.
    files = (sorted(glob.glob(f"{newest}/events_*"))
             if os.path.isdir(newest) else [newest])
    tasks: dict[int, list[dict]] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                tasks.setdefault(sid, []).append({
                    "launch": ti["Launch Time"] / 1000.0,
                    "finish": ti["Finish Time"] / 1000.0,
                    "run_ms": tm.get("Executor Run Time", 0),
                    "gc_ms": tm.get("JVM GC Time", 0),
                    "cpu_ns": tm.get("Executor CPU Time", 0),
                    "shuffle_read_wait_ms": (tm.get("Shuffle Read Metrics") or {}).get("Fetch Wait Time", 0),
                    "spill_bytes": tm.get("Memory Bytes Spilled", 0),
                })
    if not tasks:
        return []
    big = max(tasks.values(), key=len)
    return big


def profile_run(docs: int, partitions: int, input_path: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from ocr_spark.plans.pipeline import run_extraction
    from ocr_spark.session import TMPFS_SCRATCH, build_session

    log_dir = f"/dev/shm/wide_leg_events_{os.getpid()}_{partitions}"
    os.makedirs(log_dir, exist_ok=True)
    spark = build_session(
        f"wide_leg_{partitions}", master="local[32]", shuffle_partitions=32,
        extra_conf={**TMPFS_SCRATCH,
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.rolling.enabled": "false",
                    "spark.eventLog.dir": f"file:{log_dir}"})
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_path)
    out_path = f"/dev/shm/wide_leg_out_{os.getpid()}"

    # Warm-up: worker pool + codegen.
    run_extraction(spark, df.limit(2048), run_id="warm",
                   num_partitions=32).write.mode("overwrite").parquet(out_path)

    stop = threading.Event()
    samples: list[tuple] = []
    sampler = threading.Thread(target=busy_cores_sampler,
                               args=(stop, samples), daemon=True)
    sampler.start()
    t0 = time.perf_counter()
    run_extraction(spark, df, run_id=f"prof{partitions}",
                   num_partitions=partitions)\
        .write.mode("overwrite").parquet(out_path)
    wall = time.perf_counter() - t0
    n_workers = count_python_workers()
    stop.set()
    sampler.join(timeout=2)
    spark.stop()

    tasks = parse_event_log(log_dir)
    import shutil
    shutil.rmtree(out_path, ignore_errors=True)
    shutil.rmtree(log_dir, ignore_errors=True)

    rec: dict = {"partitions": partitions, "wall_s": round(wall, 2),
                 "docs_per_sec": round(docs / wall, 1),
                 "python_workers_mid_run": n_workers}
    if tasks:
        durs = sorted(t["finish"] - t["launch"] for t in tasks)
        n = len(durs)
        first_launch = min(t["launch"] for t in tasks)
        last_finish = max(t["finish"] for t in tasks)
        finishes = sorted(t["finish"] - first_launch for t in tasks)
        stage_wall = last_finish - first_launch
        # Mean concurrency: total task-seconds / stage wall.
        task_seconds = sum(durs)
        # Tail: how long the stage runs past the 90th-percentile finish.
        p90_finish = finishes[int(0.9 * (n - 1))]
        total_run_s = sum(t["run_ms"] for t in tasks) / 1000.0
        total_gc_s = sum(t["gc_ms"] for t in tasks) / 1000.0
        total_cpu_s = sum(t["cpu_ns"] for t in tasks) / 1e9
        rec.update({
            "task_run_total_s": round(total_run_s, 1),
            "task_cpu_total_s": round(total_cpu_s, 1),
            "task_gc_total_s": round(total_gc_s, 1),
            "task_shuffle_fetch_wait_s": round(
                sum(t["shuffle_read_wait_ms"] for t in tasks) / 1000.0, 1),
            "task_spill_mb": round(
                sum(t["spill_bytes"] for t in tasks) / 1e6, 1),
            "stage_tasks": n,
            "stage_wall_s": round(stage_wall, 2),
            "task_dur_p50_s": round(durs[n // 2], 2),
            "task_dur_p90_s": round(durs[int(0.9 * (n - 1))], 2),
            "task_dur_max_s": round(durs[-1], 2),
            "mean_running_tasks": round(task_seconds / stage_wall, 1),
            "tail_after_p90_finish_s": round(stage_wall - p90_finish, 2),
            "tail_fraction_of_stage": round(
                (stage_wall - p90_finish) / stage_wall, 3),
        })
    if samples:
        cores = [c for _, c in samples]
        cores_sorted = sorted(cores)
        rec["delivered_cores_mean"] = round(sum(cores) / len(cores), 1)
        rec["delivered_cores_p90"] = round(
            cores_sorted[int(0.9 * (len(cores) - 1))], 1)
    return rec


def main():
    docs = 192_000
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    partition_sweep = [64, 128, 256]
    if "--partitions" in sys.argv:
        partition_sweep = [int(x) for x in sys.argv[
            sys.argv.index("--partitions") + 1].split(",")]

    input_path = f"/dev/shm/wide_leg_input_cc_{docs}"
    if not os.path.exists(input_path):
        from ocr_spark.session import build_session
        from ocr_spark.sources import synth
        spark = build_session("wide_leg_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        synth.synth_input_df(spark, docs, partitions=64, profile="cc")\
            .write.mode("overwrite").parquet(input_path)
        spark.stop()

    runs = [profile_run(docs, p, input_path) for p in partition_sweep]
    report = {"docs": docs, "threads": 32, "runs": runs}
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/wide_leg_profile.json", "w") as f:
        json.dump(report, f, indent=2)
    write_md(report)
    print(json.dumps(report))


def write_md(report: dict) -> None:
    rows = "\n".join(
        f"| {r['partitions']} | {r['wall_s']} | {r['docs_per_sec']} | "
        f"{r.get('mean_running_tasks', '')} | "
        f"{r.get('task_dur_p50_s', '')} / {r.get('task_dur_p90_s', '')} / "
        f"{r.get('task_dur_max_s', '')} | "
        f"{r.get('tail_after_p90_finish_s', '')} "
        f"({100 * r.get('tail_fraction_of_stage', 0):.0f}%) | "
        f"{r.get('python_workers_mid_run', '')} | "
        f"{r.get('delivered_cores_mean', '')} |"
        for r in report["runs"])
    md = f"""# Wide-leg (local[32]) extraction profile

*Generated by `python tools/profile_wide_leg.py` over a
{report['docs']:,}-doc cc-profile corpus; task rows come from Spark's
event log (SparkListenerTaskEnd), delivered cores from /proc/stat
sampling during the timed window.*

| partitions | wall (s) | docs/sec | mean running tasks | task p50/p90/max (s) | tail after p90 finish | python workers | delivered cores (mean) |
|---|---|---|---|---|---|---|---|
{rows}

Reading guide: `mean running tasks` is the job's OWN achieved
concurrency (task-seconds / stage wall) — if it sits well under 32
while `python workers` is 32 and the tail is small, the gap is the
hypervisor grant, not the pipeline; a large `tail after p90 finish`
that shrinks with finer partitions indicates task-packing stragglers;
p90/p50 task-duration skew indicates data skew surviving the salt.

## Standing finding (r3 investigation, three runs on 192k docs)

The local[32] demand gap (cores_used ~15-21 of 32 in the scaling
bench) is NOT a pipeline pathology: across every profiled run the
stage held ~28-31 concurrently running tasks, 33 python workers, zero
spills, single-digit GC, and a p90→end tail under 9% of the stage
wall. Executor run-time is ~5x executor CPU-time (e.g. 182 task-s run
vs 37 task-s CPU at 64 partitions) — the JVM side of the stage spends
most of its time waiting on the Arrow python workers, which is the
designed shape for a python-parser-bound stage; throughput therefore
tracks whatever CPU the hypervisor grants the worker pool that minute.
Identical (config, corpus) walls swung 10.4s..30.4s within one hour.
The one actionable mechanism found: multi-second tasks lose whole
steal waves (a stalled vCPU holds the task to the wave's end), while
sub-second tasks reschedule around them — 64-partition layouts
measured up to 2-4x slower than 256-partition layouts inside steal
windows and never faster. Consequence: prefer FINER partitions (fixed
256 in tools/scaling_bench.py so per-task work is also identical
across levels; 4x parallelism in run_extraction's default) — on a
real cluster this trades a negligible per-task overhead for steal
and straggler resilience.
"""
    with open(f"{REPO}/BENCH/wide_leg_profile.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
