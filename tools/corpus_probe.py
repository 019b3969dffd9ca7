"""Corpus-dedup scaling probe: time the full dedup DAG (exact dedup ->
minhash signatures -> LSH banded pairs -> transitive closure ->
decisions) at one parallelism level.

Usage:
  python tools/corpus_probe.py --build [mult]     # once: synthesize corpus
  [taskset -c 0-N] python tools/corpus_probe.py <cores>

The probe corpus is the sf0.1 documents table multiplied with a
CONTROLLED duplicate structure (mult copies per doc, default 20):

  * copies 0-4   byte-identical        -> exercises exact-dedup collapse
  * copies 5-9   text + 3-word suffix  -> bounded near-dup families
                                          (J ~ 0.9 vs base, cluster size 6)
  * copies 10+   a unique marker token inserted every 3rd word
                                          -> J ~ 0.2 pairwise, below any
                                          production threshold: unique

so all three DAG regimes (hash collapse, LSH + closure, no-op pass-
through) carry realistic weight, and cluster fan-in stays bounded the
way real boilerplate families are.  Same pinning discipline as
tools/scaling_probe.py: run each level under `taskset` with a fresh
JVM and compare throughputs for the N->4N efficiency criterion.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = os.path.join(REPO, ".bench_cache", "documents_dedup_x{mult}.parquet")


def build(mult: int) -> str:
    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import get_spark

    path = CORPUS.format(mult=mult)
    if os.path.exists(path):
        return path
    spark = get_spark("corpus_probe_build")
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
                    F.array(w, F.concat(F.lit("u"), F.col("copy").cast("string"))),
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
            F.concat_ws(" ", "text", F.lit("near"),
                        F.col("copy").cast("string"), F.lit("suffix")),
        )
        .otherwise(unique_text)
        .alias("text"),
    )
    out.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def stages(cores: int, mult: int) -> None:
    """Cumulative per-stage timing of the dedup DAG at one width.

    Each stage's DataFrame is projected to its narrow key/metric
    columns before the noop write so the measurement is the stage's
    compute, not serialization of the wide `text` column through the
    sink (the full-width `keyed` noop measured ~10 s slower than the
    complete `decisions` DAG for exactly that reason)."""
    from pyspark.sql import functions as F  # noqa: F401
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark import corpus_pipeline as cp

    spark = get_spark(f"cstage{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    tune_scan_splits(spark, CORPUS.format(mult=mult))
    docs = spark.read.parquet(CORPUS.format(mult=mult))
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

    out = {"cores": cores, "mult": mult}
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
    if sys.argv[1] == "--build":
        mult = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        print(build(mult))
        return
    if sys.argv[1] == "--stages":
        stages(int(sys.argv[2]),
               int(os.environ.get("CORPUS_PROBE_MULT", "20")))
        return
    cores = int(sys.argv[1])
    mult = int(os.environ.get("CORPUS_PROBE_MULT", "20"))
    path = CORPUS.format(mult=mult)

    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark import corpus_pipeline as cp

    spark = get_spark(f"cprobe{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    # see tune_scan_splits: default 128MB splits read this corpus as ~5
    # partitions, capping the compute-heavy map side at 5-wide
    tune_scan_splits(spark, path)
    docs = spark.read.parquet(path)
    n = docs.count()

    def job():
        res = cp.corpus_dedup(docs, num_hashes=32, bands=8,
                              jaccard_threshold=0.7, hash_fn="xxhash64")
        res.decisions.write.format("noop").mode("overwrite").save()

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
        "n_docs": n,
        "times_sec": [round(x, 2) for x in times],
        "best_sec": round(best, 2),
        "median_sec": round(statistics.median(times), 2),
        "throughput_docs_per_sec": round(n / best, 1),
    }))


if __name__ == "__main__":
    main()
