"""Streaming ingest dedup (streaming/dedup_stream.py): cross-epoch
index growth, replay idempotence, and a real availableNow run."""

import os
import time

from medical_pdf__ocr_structured_ccd_ccda_output_spark.streaming import dedup_stream as ds
from medical_pdf__ocr_structured_ccd_ccda_output_spark import corpus_incremental as ci
from tests.test_corpus_incremental import TEXT_A, TEXT_B, TEXT_C, TEXT_D

BATCHES = [
    [(1, TEXT_A), (2, TEXT_B)],                      # epoch 0: both new
    [(3, TEXT_A.upper()), (4, TEXT_C)],              # epoch 1: 3 exact-dups 1
    [(5, TEXT_B + " tonight"), (6, TEXT_D)],         # epoch 2: 5 near-dups 2
]
EXPECT_KEPT = {1, 2, 4, 6}


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, ds.DOCS_SCHEMA)


def test_sink_cross_epoch_and_replay(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    log = []
    sink = ds.make_dedup_sink(idx, out, num_hashes=16, bands=4,
                              jaccard_threshold=0.5, hash_fn="xxhash64",
                              progress=log.append)
    for epoch, rows in enumerate(BATCHES):
        sink(_mkdf(spark, rows), epoch)

    dec = spark.read.parquet(os.path.join(out, "decisions.parquet"))
    got = {r["doc_id"]: (r["reason"], r["dup_of"], r["epoch_id"])
           for r in dec.collect()}
    assert got[3] == (ci.REASON_EXACT_CORPUS, 1, 1)   # cross-epoch exact
    assert got[5] == (ci.REASON_NEAR_CORPUS, 2, 2)    # cross-epoch near
    assert {d for d, (r, _, _) in got.items() if r == ci.REASON_KEPT} \
        == EXPECT_KEPT
    kept = spark.read.parquet(os.path.join(out, "kept.parquet"))
    assert {r["doc_id"] for r in kept.collect()} == EXPECT_KEPT
    index = spark.read.parquet(os.path.join(idx, "index.parquet"))
    assert {r["keep_doc_id"] for r in index.collect()} == EXPECT_KEPT

    # replaying an applied epoch is a no-op (at-least-once -> effective-once)
    sink(_mkdf(spark, BATCHES[1]), 1)
    assert any("already applied" in m for m in log)
    assert spark.read.parquet(os.path.join(out, "decisions.parquet")) \
        .count() == 6
    assert spark.read.parquet(os.path.join(idx, "index.parquet")) \
        .count() == len(EXPECT_KEPT)


def test_available_now_stream(spark, tmp_path):
    """Real readStream/writeStream run over the same corpus: the final
    kept SET is order-independent by construction (each dup loses to a
    lower-id doc whatever the micro-batching), so the assertion holds
    for any file->epoch split."""
    in_dir = str(tmp_path / "in")
    for i, rows in enumerate(BATCHES):
        _mkdf(spark, rows).coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(0.05)  # distinct mtimes -> stable source ordering

    q = ds.run_dedup_stream(
        spark, in_dir, str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
        num_hashes=16, bands=4, jaccard_threshold=0.5, hash_fn="xxhash64",
    )
    q.awaitTermination(120)
    kept = spark.read.parquet(str(tmp_path / "out" / "kept.parquet"))
    assert {r["doc_id"] for r in kept.collect()} == EXPECT_KEPT
    dec = spark.read.parquet(str(tmp_path / "out" / "decisions.parquet"))
    assert dec.count() == 6
    # multiple epochs actually ran (maxFilesPerTrigger=1 over >=3 files)
    assert dec.select("epoch_id").distinct().count() >= 2
