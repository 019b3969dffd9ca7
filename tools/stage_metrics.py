"""Per-stage task-metric profile of the dedup DAG from Spark event
logs — the root-cause instrument for the multi-executor scaling gap.

Runs the composed dedup DAG ONCE (after one warm-up) on a chosen
master, with ``spark.eventLog.enabled`` on, then aggregates every
``SparkListenerTaskEnd``'s task metrics per stage:

  executorRunTime / executorCpuTime (ms) — compute vs wall per task
  jvmGcTime (ms)
  shuffle read: local vs REMOTE bytes, fetchWaitTime
  shuffle write: bytes, writeTime
  task count, stage wall (completion - submission)

Comparing the same stages between local-cluster[1,8] and
local-cluster[4,8] answers directly: is the wide config losing to
remote shuffle fetch (remote bytes ~3/4 of total, fetch wait > 0),
to reduced per-stage parallelism (few tasks per stage vs 32 slots),
to GC, or to longer cpu time per task (memory-bandwidth/contention)?

Usage:
  python tools/stage_metrics.py thread <cores> [mult]
  python tools/stage_metrics.py cluster <n_exec> <cores> [mult]

Prints one JSON line: config + per-stage rows sorted by stage wall,
plus whole-run totals.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run(master_kind: str, a: int, b: int, mult: int, log_dir: str) -> float:
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark import (
        corpus_pipeline as cp,
    )

    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if master_kind == "cluster":
        from pyspark.sql import SparkSession

        # mirrors tools/cluster_probe.get_cluster_spark, plus the
        # startup-only eventLog confs
        builder_patch = extra
        builder = SparkSession.builder
        worker_mem = 7168 + 1024
        builder = (
            builder.master(f"local-cluster[{a},{b},{worker_mem}]")
            .appName(f"smx_{a}x{b}")
            .config("spark.executor.memory", "7168m")
            .config("spark.executorEnv.PYTHONPATH", REPO)
            .config("spark.sql.shuffle.partitions", str(4 * a * b))
        )
        for k, v in {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
            "spark.cleaner.periodicGC.interval": "1min",
            "spark.shuffle.sort.bypassMergeThreshold": "8",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "134217728",
            **builder_patch,
        }.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master(f"local[{a}]")
            .appName(f"smx_local{a}")
            .config("spark.sql.shuffle.partitions", str(4 * a))
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "16g"))
        )
        for k, v in {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            "spark.cleaner.periodicGC.interval": "1min",
            "spark.shuffle.sort.bypassMergeThreshold": "8",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "134217728",
            **extra,
        }.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")

    path = os.path.join(REPO, ".bench_cache",
                        f"documents_dedup_x{mult}.parquet")
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)

    def job():
        res = cp.corpus_dedup(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.7, hash_fn="xxhash64")
        res.decisions.write.format("noop").mode("overwrite").save()

    job()  # warm (JIT; its stages land in the log too — see marker)
    spark.sparkContext.setJobGroup("measured", "measured-run")
    t0 = time.time()
    job()
    dt = time.time() - t0
    spark.stop()
    return dt


def parse(log_dir: str) -> dict:
    """Aggregate TaskEnd metrics per stage for the MEASURED run only
    (jobs whose group property is 'measured')."""
    # Spark 4 writes an eventlog_v2_<app> DIRECTORY (rolling logs):
    # events_* files inside, plus an appstatus_* marker — walk it.
    files = []
    for root, _dirs, names in os.walk(log_dir):
        for n in sorted(names):
            if n.startswith("appstatus"):
                continue
            files.append(os.path.join(root, n))
    files.extend(p for p in sorted(glob.glob(os.path.join(log_dir, "*")))
                 if os.path.isfile(p) and p not in files)
    files = sorted(set(files))
    def opener(p):
        if p.endswith(".gz"):
            return gzip.open(p, "rt")
        return open(p, errors="replace")
    measured_stages: set[int] = set()
    stage_rows: dict[int, dict] = {}
    for path in files:
        with opener(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                t = ev.get("Event")
                if t == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    if props.get("spark.jobGroup.id") == "measured":
                        for sid in ev.get("Stage IDs", []):
                            measured_stages.add(sid)
                elif t == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    row = stage_rows.setdefault(sid, {
                        "stage": sid, "name": si.get("Stage Name", ""),
                        "n_tasks": si.get("Number of Tasks", 0),
                        "wall_ms": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                        "fetch_wait_ms": 0, "remote_mb": 0.0, "local_mb": 0.0,
                        "write_mb": 0.0, "write_ms": 0,
                    })
                    # TaskEnd events may have created the row first
                    # with empty name/task count — always refresh
                    row["name"] = si.get("Stage Name", row["name"])
                    row["n_tasks"] = si.get("Number of Tasks", row["n_tasks"])
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub and comp:
                        row["wall_ms"] = comp - sub
                elif t == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    row = stage_rows.setdefault(sid, {
                        "stage": sid, "name": "", "n_tasks": 0,
                        "wall_ms": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                        "fetch_wait_ms": 0, "remote_mb": 0.0, "local_mb": 0.0,
                        "write_mb": 0.0, "write_ms": 0,
                    })
                    row["run_ms"] += tm.get("Executor Run Time", 0)
                    row["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                    row["gc_ms"] += tm.get("JVM GC Time", 0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    row["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                    row["remote_mb"] += srm.get("Remote Bytes Read", 0) / 1e6
                    row["local_mb"] += srm.get("Local Bytes Read", 0) / 1e6
                    swm = tm.get("Shuffle Write Metrics") or {}
                    row["write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                    row["write_ms"] += swm.get("Shuffle Write Time", 0) // 1_000_000
    rows = [r for sid, r in sorted(stage_rows.items())
            if sid in measured_stages]
    tot = {
        k: round(sum(r[k] for r in rows), 1)
        for k in ("run_ms", "cpu_ms", "gc_ms", "fetch_wait_ms",
                  "remote_mb", "local_mb", "write_mb", "write_ms")
    }
    tot["n_stages"] = len(rows)
    tot["wall_ms_sum"] = sum(r["wall_ms"] for r in rows)
    for r in rows:
        for k in ("remote_mb", "local_mb", "write_mb"):
            r[k] = round(r[k], 1)
        r["name"] = r["name"][:60]
    rows.sort(key=lambda r: -r["wall_ms"])
    return {"stages": rows[:25], "totals": tot}


def main():
    kind = sys.argv[1]
    if kind == "cluster":
        a, b = int(sys.argv[2]), int(sys.argv[3])
        mult = int(sys.argv[4]) if len(sys.argv) > 4 else 320
    else:
        a, b = int(sys.argv[2]), 0
        mult = int(sys.argv[3]) if len(sys.argv) > 3 else 320

    log_dir = tempfile.mkdtemp(prefix="smx_events_")
    try:
        dt = _run(kind, a, b, mult, log_dir)
        prof = parse(log_dir)
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)
    print(json.dumps({
        "config": f"{kind}:{a}" + (f"x{b}" if kind == "cluster" else ""),
        "mult": mult,
        "measured_wall_sec": round(dt, 2),
        **prof,
    }))


if __name__ == "__main__":
    main()
