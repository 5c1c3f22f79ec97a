"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship number is the extraction pipeline's docs/sec (BASELINE.md
primary metric); the other queries time the operator families. Scaling
evidence across two parallelism levels is produced by
tools/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    from ocr_spark import schemas
    from ocr_spark.operators import crosscheck, dedup, similarity, textstats
    from ocr_spark.plans.pipeline import run_extraction
    from ocr_spark.session import TMPFS_SCRATCH, build_session
    from ocr_spark.sources import synth

    spark = build_session("ocr_spark_bench", master=f"local[{cpus}]",
                          shuffle_partitions=cpus,
                          extra_conf=TMPFS_SCRATCH)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # Extraction corpus scaled with sf: sf0.1 -> 160k synthetic docs
    # (cc profile: Common-Crawl-realistic sizes). Materialized to
    # parquet BEFORE the clock starts — the timed number is extraction
    # throughput, not synthetic-corpus generation.
    n_docs = max(2000, int(1_600_000 * sf))
    input_path = f"/dev/shm/ocr_spark_bench_input_{os.getpid()}"
    synth.synth_input_df(spark, n_docs, partitions=cpus * 2, profile="cc")\
        .write.mode("overwrite").parquet(input_path)
    input_df = spark.read.parquet(input_path)

    timings: dict[str, float] = {}

    def timed(name):
        def deco(fn):
            t0 = time.perf_counter()
            fn()
            timings[name] = round(time.perf_counter() - t0, 3)
        return deco

    extracted_path = f"/dev/shm/ocr_spark_bench_extracted_{os.getpid()}"

    # Untimed warm-up: spin up the python worker pool (pandas imports)
    # and codegen on a small slice so the timed number is steady-state
    # throughput — what a long-running production job sustains.
    run_extraction(spark, input_df.limit(2048).repartition(cpus),
                   run_id="warmup", num_partitions=cpus)\
        .write.mode("overwrite").parquet(extracted_path)

    # Min of 4 timed runs: the sandbox VM has minutes-long hypervisor
    # steal waves that can triple a single wall reading (see
    # BENCH/BASELINE.md methodology); min is the steady-state estimate.
    # All walls + the estimator name are emitted in the JSON so the
    # methodology travels with the number.
    extract_walls = []
    for r in range(4):
        t0 = time.perf_counter()
        out = run_extraction(spark, input_df, run_id=f"bench{r}",
                             num_partitions=cpus * 2)
        out.write.mode("overwrite").parquet(extracted_path)
        extract_walls.append(round(time.perf_counter() - t0, 3))
    timings["extract_pipeline"] = min(extract_walls)

    extracted = spark.read.parquet(extracted_path)

    @timed("crosscheck")
    def _cc():
        crosscheck.cross_check(extracted).count()

    @timed("dedup_exact")
    def _de():
        dedup.exact_dedup(docs).count()

    @timed("minhash_lsh")
    def _mh():
        # poly: numpy rolling-hash signature fast path (~3x vs the
        # expression form; verify stage stays exact-Jaccard).
        dedup.minhash_lsh_pairs(docs, threshold=0.3,
                                hash_mode="poly").count()

    @timed("simhash")
    def _sh():
        dedup.simhash_pairs(docs, max_hamming=10).count()

    @timed("ann_bruteforce")
    def _ann():
        similarity.cosine_topk(emb.filter(F.col("vec_id") < 32), emb, k=10).count()

    @timed("lsh_ann")
    def _lsh():
        # 4-table multi-table LSH on the BLAS signature path (default
        # hash_mode='md5'): higher recall than the r1 single-table form
        # AND faster — signatures are one matmul per Arrow batch.
        similarity.lsh_cosine_topk(emb.filter(F.col("vec_id") < 32), emb,
                                   k=10, planes=8, tables=4).count()

    @timed("textstats")
    def _ts():
        textstats.document_stats(docs).count()

    @timed("pricing_summary")
    def _q1():
        (lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
         .groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum("l_quantity"), F.avg("l_quantity"), F.count("*"))
         .count())

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["extract_pipeline"], 1)
    n_failed = extracted.filter(F.col("error").isNotNull()).count()

    import shutil
    shutil.rmtree(extracted_path, ignore_errors=True)
    shutil.rmtree(input_path, ignore_errors=True)

    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction_docs": n_docs,
        "extraction_docs_per_sec": docs_per_sec,
        "cpus": cpus,
        # Estimator metadata: the headline is the min of N warmed runs
        # on tmpfs scratch; docs/sec divides by docs ATTEMPTED, which
        # includes the deliberate error-path coverage rows (they run the
        # full cascade and fail by design — see sources/synth.py).
        "estimator": "min_of_4_warm_tmpfs",
        "extract_walls": extract_walls,
        "docs_attempted": n_docs,
        "docs_extracted": n_docs - n_failed,
        "docs_failed_by_design": n_failed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
