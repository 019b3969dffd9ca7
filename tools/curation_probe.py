"""Curation-pipeline scaling probe: time `corpus.curate_corpus` (the
composed redact -> filter -> decontaminate -> dedup-canonicalize ->
split pipeline) at one or two parallelism levels.

Usage:
  python tools/curation_probe.py --build [mult]   # once: synthesize corpus
  [taskset -c 0-N] python tools/curation_probe.py <cores> [mult]
  python tools/curation_probe.py --pair <lo> <hi> [mult]

Probe corpus (default mult=64): the sf0.1 documents table multiplied
with the duplicate structure the pipeline is built for:

  * copies 0-4   byte-identical            -> exact-duplicate groups
                                              (canonicalization load)
  * copies 5+    unique marker every 3rd word -> unique content
  * doc_id%5==0  PII appended              -> redaction load

The eval set for decontamination stays FIXED at 250 docs regardless of
mult (eval benches don't grow with the corpus — the broadcast side
stays small, as in production).  Same protocol as tools/span_probe.py:
fresh JVM per leg, taskset pinning with the rest of the box as
co-tenant buffer, min-of-3 after 2 warm-ups, spin ceilings probed
around the pair.  Throughput unit is decision rows (docs)/sec.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = os.path.join(REPO, ".bench_cache", "documents_curation_x{mult}.parquet")
EVALS = os.path.join(REPO, ".bench_cache", "curation_evals.parquet")


def build(mult: int) -> str:
    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import get_spark

    path = CORPUS.format(mult=mult)
    spark = get_spark("curation_probe_build")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    if not os.path.exists(EVALS):
        docs.orderBy("doc_id").limit(250).select("doc_id", "text") \
            .write.mode("overwrite").parquet(EVALS)
    if os.path.exists(path):
        spark.stop()
        return path
    copies = docs.select(
        "doc_id", "source", "text",
        F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("copy"),
    )
    words = F.split(F.col("text"), " ")
    unique_text = F.array_join(
        F.flatten(
            F.transform(
                words,
                lambda w, i: F.when(
                    i % 3 == 2,
                    F.array(w, F.concat(F.lit("u"), F.col("copy").cast("string"),
                                        F.lit("d"), F.col("doc_id").cast("string"))),
                ).otherwise(F.array(w)),
            )
        ),
        " ",
    )
    body = F.when(F.col("copy") < 5, F.col("text")).otherwise(unique_text)
    with_pii = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(body, F.lit(" reach me at probe"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com or 555-123-4567")),
    ).otherwise(body)
    out = copies.select(
        (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
        "source",
        with_pii.alias("text"),
    )
    out.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def leg(cores: int, mult: int) -> None:
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
        curate_corpus,
    )

    path = CORPUS.format(mult=mult)
    spark = get_spark(f"curation{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)
    evals = spark.read.parquet(EVALS)
    n_docs = docs.count()

    def job():
        # narrow projection through the noop sink: measure the decision
        # compute, not rewriting the signal columns
        curate_corpus(docs, evals, min_quality=0.5) \
            .select("doc_id", "keep", "drop_reason", "split") \
            .write.format("noop").mode("overwrite").save()

    for _ in range(2):
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
        "n_docs": n_docs,
        "times_sec": [round(x, 2) for x in times],
        "best_sec": round(best, 2),
        "median_sec": round(statistics.median(times), 2),
        "throughput_docs_per_sec": round(n_docs / best, 1),
    }))


def pair(lo: int, hi: int, mult: int) -> None:
    from tools.cluster_pair import _spin

    def ceiling() -> float:
        return round((_spin(hi) / _spin(lo)) / (hi / lo), 3)

    def run_leg(cores: int, pin: bool) -> dict:
        cmd = ["python", os.path.abspath(__file__), str(cores), str(mult)]
        if pin:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        return json.loads(out.stdout.strip().splitlines()[-1])

    c_before = ceiling()
    r_lo = run_leg(lo, pin=True)
    r_hi = run_leg(hi, pin=hi < 32)
    c_after = ceiling()
    eff = (r_lo["best_sec"] / r_hi["best_sec"]) / (hi / lo)
    print(json.dumps({
        "pair": [lo, hi],
        "n_docs": r_lo["n_docs"],
        f"t_local{lo}_sec": r_lo["best_sec"],
        f"t_local{hi}_sec": r_hi["best_sec"],
        f"times_local{lo}": r_lo["times_sec"],
        f"times_local{hi}": r_hi["times_sec"],
        f"throughput_local{lo}": r_lo["throughput_docs_per_sec"],
        f"throughput_local{hi}": r_hi["throughput_docs_per_sec"],
        "speedup": round(r_lo["best_sec"] / r_hi["best_sec"], 3),
        "efficiency": round(eff, 3),
        "cpu_ceiling_before": c_before,
        "cpu_ceiling_after": c_after,
        "efficiency_vs_ceiling": round(eff / min(c_before, c_after), 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


def main():
    if sys.argv[1] == "--build":
        mult = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        print(build(mult))
    elif sys.argv[1] == "--pair":
        lo, hi = int(sys.argv[2]), int(sys.argv[3])
        mult = int(sys.argv[4]) if len(sys.argv) > 4 else 64
        pair(lo, hi, mult)
    else:
        cores = int(sys.argv[1])
        mult = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        leg(cores, mult)


if __name__ == "__main__":
    main()


"""Reference analog: the staged corpus jobs this probe measures are the
engine's beyond-reference layer; the decision-table surface mirrors the
reference's keep/prune audit rows (deduplication_service.py:101-480)."""
