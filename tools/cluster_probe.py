"""Multi-executor (local-cluster) timing probe for the composed
corpus-dedup DAG — the round-4 open question made measurable.

Why this exists: the ×320 dedup DAG measured 0.373 end-to-end
efficiency from local[8] -> local[32] (BENCH_SCALING.json
round4_corpus_dedup_x320_final), with a phase-level argument that the
bound is the SINGLE-JVM local-mode shuffle machinery — one
BlockManager, one shuffle-file namespace, one memory manager shared
by all 32 task threads — which on a real cluster is a PER-EXECUTOR
resource.  ``local-cluster[n, cores, mem_mb]`` is the in-sandbox test
of exactly that hypothesis: it launches n REAL executor JVMs (separate
processes, separate BlockManagers, separate shuffle servers and disk
namespaces, separate python-worker pools) against the same driver, on
the same box.  Comparing

    local-cluster[1,8,...]   (1 executor  x 8 cores = 8 total)
    local-cluster[4,8,...]   (4 executors x 8 cores = 32 total)

holds cores-per-executor constant and scales EXECUTOR COUNT 1 -> 4 —
the same shape as the N -> 4N cluster criterion — while giving each
executor its own shuffle machinery.  If the single-JVM hypothesis is
right, efficiency here should recover toward the >= 0.8 criterion
where the local[8] -> local[32] thread-scaling pair could not.

Usage:
  [taskset -c 0-7] python tools/cluster_probe.py <n_executors> <cores_per_exec> [job]

job: "dedup" (default — the composed dedup DAG at CORPUS_PROBE_MULT,
default x320) or "extract" (the extraction+sessionize headline job on
the x80 transcripts corpus).

Pinning protocol (same as tools/scaling_probe.py): pin the SMALL leg
to exactly its total core count via taskset (children — executor JVMs
and python workers — inherit the affinity mask), leave the leg that
owns the whole box unpinned.  Fresh JVMs per leg; 2 warm-ups then
min-of-3 timed reps; spin-probe ceilings around the pair (run by the
caller, see bench.py _spin) validate the window.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def get_cluster_spark(n_exec: int, cores: int, app: str,
                      exec_mem_mb: int = 7168):
    """SparkSession on local-cluster[n_exec, cores, mem] with the
    engine's standard configs (mirrors session.get_spark, which
    hard-codes local[N] semantics like driver-only memory)."""
    from pyspark.sql import SparkSession

    worker_mem = exec_mem_mb + 1024  # worker JVM headroom over executor
    builder = (
        SparkSession.builder
        .master(f"local-cluster[{n_exec},{cores},{worker_mem}]")
        .appName(app)
        .config("spark.executor.memory", f"{exec_mem_mb}m")
        # executor python workers are separate processes in separate
        # JVMs here: ship the repo the way spark-submit --py-files
        # would (Arrow UDFs that import the package need it on the
        # worker's sys.path; self-contained UDFs don't care)
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", str(4 * n_exec * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.shuffle.sort.bypassMergeThreshold", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stages(n_exec: int, cores: int, mult: int) -> None:
    """Cumulative per-phase timing of the dedup DAG on local-cluster —
    the multi-executor twin of tools/corpus_probe.py --stages, for
    root-causing which phase fails to scale with executor count.
    Phase k's time includes phases 1..k (same cumulative convention as
    the round-4 thread-mode decomposition, so deltas are comparable)."""
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark import (
        corpus_pipeline as cp,
    )

    path = os.path.join(REPO, ".bench_cache",
                        f"documents_dedup_x{mult}.parquet")
    spark = get_cluster_spark(n_exec, cores, f"cstage{n_exec}x{cores}")
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)
    narrow = {
        "keyed": ["doc_id", "content_key"],
        "exact_map": None,
        "signatures": None,
        "pairs": None,
        "clusters": None,
        "decisions": None,
    }

    def run(stage):
        res = cp.corpus_dedup(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.7, hash_fn="xxhash64")
        df = getattr(res, stage)
        cols = narrow[stage]
        if cols:
            df = df.select(*cols)
        df.write.format("noop").mode("overwrite").save()

    out = {"n_executors": n_exec, "cores_per_executor": cores, "mult": mult}
    for s in narrow:
        run(s)  # warm
        times = []
        for _ in range(2):
            t0 = time.time()
            run(s)
            times.append(time.time() - t0)
        out[s] = round(min(times), 2)
    spark.stop()
    print(json.dumps(out))


def main():
    if sys.argv[1] == "--stages":
        stages(int(sys.argv[2]), int(sys.argv[3]),
               int(os.environ.get("CORPUS_PROBE_MULT", "320")))
        return
    n_exec = int(sys.argv[1])
    cores = int(sys.argv[2])
    job_name = sys.argv[3] if len(sys.argv) > 3 else "dedup"

    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        tune_scan_splits,
    )

    if job_name == "dedup":
        mult = int(os.environ.get("CORPUS_PROBE_MULT", "320"))
        path = os.path.join(REPO, ".bench_cache",
                            f"documents_dedup_x{mult}.parquet")
        from medical_pdf__ocr_structured_ccd_ccda_output_spark import (
            corpus_pipeline as cp,
        )

        def job(docs):
            res = cp.corpus_dedup(docs, num_hashes=32, bands=8,
                                  jaccard_threshold=0.7, hash_fn="xxhash64")
            res.decisions.write.format("noop").mode("overwrite").save()
    else:
        path = os.environ.get(
            "CLUSTER_PROBE_CORPUS",
            os.path.join(REPO, ".bench_cache", "transcripts_sf0.1_x80.parquet"),
        )
        from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.extract import (
            extract_turns,
        )
        from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.sessionize import (
            assign_visits,
        )

        def job(docs):
            assign_visits(extract_turns(docs, with_sections=True)) \
                .write.format("noop").mode("overwrite").save()

    spark = get_cluster_spark(n_exec, cores, f"cluster_probe_{n_exec}x{cores}")
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)
    n = docs.count()

    for _ in range(2):
        job(docs)
    times = []
    for _ in range(3):
        t0 = time.time()
        job(docs)
        times.append(time.time() - t0)
    spark.stop()
    best = min(times)
    print(json.dumps({
        "master": f"local-cluster[{n_exec},{cores}]",
        "n_executors": n_exec,
        "cores_per_executor": cores,
        "total_cores": n_exec * cores,
        "job": job_name,
        "n_rows": n,
        "times_sec": [round(x, 2) for x in times],
        "best_sec": round(best, 2),
        "median_sec": round(statistics.median(times), 2),
        "throughput_rows_per_sec": round(n / best, 1),
    }))


if __name__ == "__main__":
    main()
