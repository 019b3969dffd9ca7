"""Single-parallelism-level extraction-job timing probe.

Usage: [taskset -c 0-N] python tools/scaling_probe.py <cores> [corpus_path]

Runs the full extraction+sessionize job on local[<cores>] with 3 JIT
warm-ups then prints min/median of 3 timed reps as one JSON line.
Run it once per parallelism level (optionally under `taskset` so the
JVM + python workers are confined to the matching CPU set — the honest
analog of an N-node vs 4N-node cluster, where each node is
CPU-bounded); compare the throughputs for the scaling-efficiency
criterion.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/.bench_cache/transcripts_sf0.1_x80.parquet"

    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.extract import extract_turns
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.sessionize import assign_visits

    spark = get_spark(f"probe{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    # size scan splits to the corpus: the Arrow extractor runs in the
    # scan stage, and default 128MB splits read the whole x80 corpus as
    # ~5 partitions — capping map parallelism at 5 regardless of cores
    tune_scan_splits(spark, corpus)
    t = spark.read.parquet(corpus)
    n = t.count()

    def job():
        assign_visits(extract_turns(t, with_sections=True)) \
            .write.format("noop").mode("overwrite").save()

    for _ in range(3):
        job()
    times = []
    for _ in range(3):
        t0 = time.time()
        job()
        times.append(time.time() - t0)
    spark.stop()
    best = min(times)
    print(json.dumps({
        "cores": cores,
        "n_turns": n,
        "times_sec": [round(x, 2) for x in times],
        "best_sec": round(best, 2),
        "median_sec": round(statistics.median(times), 2),
        "throughput_turns_per_sec": round(n / best, 1),
    }))


if __name__ == "__main__":
    main()
