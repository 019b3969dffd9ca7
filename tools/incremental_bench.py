"""Incremental-dedup admit cost at scale (VERDICT round-4 item 4).

Claim under test (corpus_incremental.py docstring): admitting a batch
against a materialized dedup index costs ~one scan of the index's
key/band tables — FLAT in how many batches came before — because the
batch side is broadcast into inner probes of the index scan and no
corpus-derived row ever shuffles.

Protocol:
  1. Build (once, cached on disk) the staged-dedup index over the
     ×1280 corpus (6.4 M docs — 16× the batch) via run_corpus_job,
     production tier (xxhash64, 32/8, J≥0.7).
  2. Admit TWO consecutive ×80-sized batches (400 k docs each, doc_ids
     offset into a disjoint range; texts reuse the sf0.1 strata so the
     exact/near/unique admit mix is realistic).  Batch 2 runs against
     index + batch-1 survivors, i.e. the production steady state.
  3. Time each admit end-to-end (signatures + probes + decision/kept
     parquet writes + index append) and, for calibration, one bare
     scan of the same index table (noop sink).

Reported: t_admit_b1, t_admit_b2 (flatness = t_b2/t_b1), t_index_scan
(the admit's theoretical floor), docs/sec through the admit path.

Usage: python tools/incremental_bench.py [mult_index] [mult_batch]
(defaults 1280 / 80).  Uses the current SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    mult_index = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    mult_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
        tune_scan_splits,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark import corpus_job as cj

    corpus_path = os.path.join(REPO, ".bench_cache",
                               f"documents_dedup_x{mult_index}.parquet")
    batch_path = os.path.join(REPO, ".bench_cache",
                              f"documents_dedup_x{mult_batch}.parquet")
    out = os.path.join(REPO, ".bench_cache", f"inc_index_x{mult_index}")

    spark = get_spark("incremental_bench")
    tune_scan_splits(spark, corpus_path, batch_path)

    # --- 1. base index (cached across bench invocations) ---
    built = False
    t_build = None
    if not os.path.exists(os.path.join(out, "_manifest")):
        shutil.rmtree(out, ignore_errors=True)
        docs = spark.read.parquet(corpus_path)
        t0 = time.time()
        cj.run_corpus_job(spark, docs, out, run_id="base",
                          progress=lambda *_: None)
        t_build = round(time.time() - t0, 2)
        built = True

    # --- 2. two ×{mult_batch} admit batches, disjoint doc_id ranges ---
    base_batch = spark.read.parquet(batch_path)
    n_batch = base_batch.count()

    def batch(i: int):
        # offset ids into a range the index can't contain.  Both
        # batches get the SAME per-doc text transform (flatness in
        # batch COUNT requires identical admit mixes — the first cut
        # of this bench made batch 1 all-exact and batch 2 all-near
        # and measured the mix difference, not batch-count growth):
        #   doc_id%3==0  unchanged        -> exact-dup of the corpus
        #   doc_id%3==1  3-word suffix    -> near-dup of the corpus
        #   doc_id%3==2  salted every 3rd word -> unique, kept
        words = F.split(F.col("text"), " ")
        salted = F.array_join(
            F.flatten(F.transform(
                words,
                lambda w, j: F.when(
                    j % 3 == 2,
                    # batch-specific salt so batch 2's uniques are not
                    # exact dups of batch 1's (mix identical vs index)
                    F.array(w, F.concat(F.lit(f"q{i}x"),
                                        (F.col("doc_id") % 97).cast("string"))),
                ).otherwise(F.array(w)),
            )),
            " ",
        )
        return base_batch.select(
            (F.col("doc_id") + F.lit((i + 1) * 10_000_000_000)).alias("doc_id"),
            F.when(F.col("doc_id") % 3 == 0, F.col("text"))
             .when(F.col("doc_id") % 3 == 1,
                   F.concat_ws(" ", "text", F.lit("near admit suffix")))
             .otherwise(salted)
             .alias("text"),
        )

    run_tag = uuid.uuid4().hex[:8]

    # one-doc pre-admit: triggers the write-once corpus_bands artifact
    # derivation (and any rebuild after a code change) OUTSIDE the
    # timed admits, so t_b1/t_b2 compare steady-state batch cost only;
    # the derivation cost is reported separately
    t0 = time.time()
    cj.run_incremental_job(
        spark, batch(9).limit(1), out, base_run_id="base",  # disjoint id range vs b1/b2
        inc_run_id=f"bench_{run_tag}_warm", progress=lambda *_: None,
    )
    t_warm = round(time.time() - t0, 2)

    admits = []
    for i in range(2):
        b = batch(i)
        t0 = time.time()
        cj.run_incremental_job(
            spark, b, out, base_run_id="base",
            inc_run_id=f"bench_{run_tag}_{i}",
            progress=lambda *_: None,
        )
        admits.append(round(time.time() - t0, 2))

    # --- 3. calibration: one bare scan of the index table ---
    idx = cj._read_shards(spark, out, "exact_sigs", 1)
    idx.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    idx.write.format("noop").mode("overwrite").save()
    t_scan = round(time.time() - t0, 2)
    n_index = idx.count()

    spark.stop()
    print(json.dumps({
        "mult_index": mult_index,
        "mult_batch": mult_batch,
        "n_index_entries": n_index,  # distinct content reps in the index
        "n_batch_docs": n_batch,
        "index_built_this_run": built,
        "t_build_index_sec": t_build,
        "t_warm_admit_plus_band_artifact_sec": t_warm,
        "t_admit_batch1_sec": admits[0],
        "t_admit_batch2_sec": admits[1],
        "flatness_b2_over_b1": round(admits[1] / admits[0], 3),
        "t_index_scan_sec": t_scan,
        "admit_docs_per_sec": round(n_batch / min(admits), 1),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
