"""Substring-span-dedup scaling probe: time `corpus.dedup_spans` at one
or two parallelism levels over a duplicate-structured corpus.

Usage:
  python tools/span_probe.py --build [mult]      # once: synthesize corpus
  [taskset -c 0-N] python tools/span_probe.py <cores> [mult]
  python tools/span_probe.py --pair <lo> <hi> [mult]

Probe corpus (default mult=64): the sf0.1 documents table multiplied
with the same three-regime structure as tools/corpus_probe.py, read
through span-dedup eyes:

  * copies 0-4   byte-identical        -> whole-doc runs excised down
                                          to one canonical copy
  * copies 5-9   text + 3-word suffix  -> full-body runs duplicated,
                                          suffixes unique
  * copies 10+   unique marker every 3rd word -> NO duplicated
                                          min_len-gram anywhere: the
                                          pass-through regime

so the probe carries both the heavy-excision and the no-op regime the
way a real boilerplate-laden crawl does.  Same protocol as
tools/thread_pair.py: fresh JVM per leg (subprocess self-invocation),
`taskset` pinning with the rest of the box as co-tenant buffer,
min-of-3 after 2 warm-ups, spin ceilings probed before and after for
the --pair mode.  Throughput unit is corpus words/sec (the position
table is one row per word — the scale driver).
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

CORPUS = os.path.join(REPO, ".bench_cache", "documents_spans_x{mult}.parquet")


def build(mult: int) -> str:
    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import get_spark

    path = CORPUS.format(mult=mult)
    if os.path.exists(path):
        return path
    spark = get_spark("span_probe_build")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    copies = docs.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("copy")
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
    out = copies.select(
        (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
        F.when(F.col("copy") < 5, F.col("text"))
        .when(
            F.col("copy") < 10,
            F.concat_ws(" ", "text", F.lit("suffix"),
                        F.col("copy").cast("string"), F.lit("marker")),
        )
        .otherwise(unique_text)
        .alias("text"),
    )
    out.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def leg(cores: int, mult: int) -> None:
    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
        dedup_spans,
    )

    path = CORPUS.format(mult=mult)
    spark = get_spark(f"span{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_words = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")))).collect()[0][0]

    def job():
        # narrow projection through the noop sink so the measurement is
        # the dedup compute, not rewriting the full cleaned text column
        dedup_spans(docs, min_len=20, hash_fn="xxhash64") \
            .select("doc_id", "n_words", "n_removed") \
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
        "n_words": int(n_words),
        "times_sec": [round(x, 2) for x in times],
        "best_sec": round(best, 2),
        "median_sec": round(statistics.median(times), 2),
        "throughput_words_per_sec": round(n_words / best, 1),
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
        "n_words": r_lo["n_words"],
        f"t_local{lo}_sec": r_lo["best_sec"],
        f"t_local{hi}_sec": r_hi["best_sec"],
        f"times_local{lo}": r_lo["times_sec"],
        f"times_local{hi}": r_hi["times_sec"],
        f"throughput_local{lo}": r_lo["throughput_words_per_sec"],
        f"throughput_local{hi}": r_hi["throughput_words_per_sec"],
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
