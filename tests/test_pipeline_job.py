"""End-to-end pipeline, XML renderer, manifest resumability."""

import os
import xml.etree.ElementTree as ET

import pytest

from medical_pdf__ocr_structured_ccd_ccda_output_spark import fixtures
from medical_pdf__ocr_structured_ccd_ccda_output_spark.pipeline import run_pipeline
from medical_pdf__ocr_structured_ccd_ccda_output_spark.sources.manifest import Manifest


@pytest.fixture(scope="module")
def result(spark):
    df = fixtures.transcripts_spark_df(spark, 30, seed=42)
    return run_pipeline(spark, df, run_id="t")


def test_pipeline_shapes(result):
    n_turns = result.extracted_turns.count()
    assert n_turns > 100
    assert result.visit_spans.count() > 30
    # P1 ingest validation quarantines the fixture conversations that
    # exceed the 100-turn page-count bound (pdf_service.py:28-99 analog)
    quarantined = result.quarantine.collect()
    assert len(quarantined) == 2
    assert all(r["warnings"] == ["too_many_pages"] for r in quarantined)
    assert result.documents.count() == 30 - len(quarantined)
    assert result.metrics.count() >= 6
    assert result.dedup_log.columns.count("entity_type") == 1


def test_pipeline_validation_off(spark):
    df = fixtures.transcripts_spark_df(spark, 10, seed=7)
    res = run_pipeline(spark, df, run_id="nv", with_validation=False,
                       with_entities=False, with_xml=False)
    assert res.quarantine is None
    assert res.documents.count() == 10


def test_xml_well_formed(result):
    rows = result.ccd_xml.limit(5).collect()
    assert rows
    for r in rows:
        root = ET.fromstring(r["ccd_xml"])
        assert root.tag.endswith("ClinicalDocument")


def test_lineage(result):
    lin = result.lineage["extracted_turns"].collect()
    assert sum(r["rows"] for r in lin) == result.extracted_turns.count()
    assert all(r["stage"] == "extract+sessionize" for r in lin)


def test_job_resume(spark, tmp_path):
    """Shard manifest: a second run with --resume skips completed shards."""
    from pyspark.sql import functions as F
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    fixtures.transcripts_spark_df(spark, 12, seed=7).write.parquet(
        os.path.join(in_dir, "transcripts.parquet"))

    from medical_pdf__ocr_structured_ccd_ccda_output_spark import job

    # simulate a crashed run: pretend shard 0 already committed
    transcripts = spark.read.parquet(os.path.join(in_dir, "transcripts.parquet"))
    man = Manifest(spark, os.path.join(out_dir, "_manifest"), "r1")
    assert man.pending(transcripts, 3) == [0, 1, 2]
    man.mark_done(0, 0)
    assert man.pending(transcripts, 3) == [1, 2]

    job.main([
        "--input", in_dir, "--output", out_dir,
        "--run-id", "r1", "--shards", "3", "--resume", "--no-raw-text",
    ])
    man2 = Manifest(spark, os.path.join(out_dir, "_manifest"), "r1")
    assert man2.pending(transcripts, 3) == []
    # shard 0 was skipped -> no output dir for it
    assert not os.path.exists(os.path.join(out_dir, "extracted_turns_shard0.parquet"))
    got = spark.read.parquet(os.path.join(out_dir, "extracted_turns_shard1.parquet"))
    assert got.count() > 0
    # shards partition conv_ids disjointly
    s1 = {r["conv_id"] for r in got.select("conv_id").distinct().collect()}
    s2 = {r["conv_id"] for r in spark.read.parquet(
        os.path.join(out_dir, "extracted_turns_shard2.parquet")
    ).select("conv_id").distinct().collect()}
    assert not (s1 & s2)


def test_manifest_refuses_shard_count_change(spark, tmp_path):
    """Round-3 review fix: pmod(hash, n) bucketing is not stable across
    n, so resuming with a different --shards would silently skip every
    conversation whose new bucket is already marked done."""
    import pytest

    man = Manifest(spark, str(tmp_path / "_m"), "r1")
    man.mark_done(0, 10, n_shards=64)
    tr = fixtures.transcripts_spark_df(spark, 4, seed=1)
    assert man.pending(tr, 64) == list(range(1, 64))
    with pytest.raises(ValueError, match="shards"):
        man.pending(tr, 32)


def test_io_location_dispatch(tmp_path):
    """Round-3 review fix: relative filesystem paths must route to the
    parquet layout, not the Iceberg catalog branch."""
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.sources.io import (
        is_iceberg_location,
    )

    assert not is_iceberg_location("/abs/dir")
    assert not is_iceberg_location("data/transcripts")   # relative path
    assert not is_iceberg_location("out")                # bare relative dir
    assert not is_iceberg_location("s3://bucket/prefix")
    assert not is_iceberg_location(str(tmp_path))        # existing dir
    assert is_iceberg_location("lake.db")                # catalog.namespace


def test_tune_scan_splits_widens_small_corpus(spark, tmp_path):
    """Round-4 fix: under the default 128MB maxPartitionBytes + 4MB
    openCostInBytes, a small many-file compressed corpus packs into a
    handful of scan partitions, capping the compute-heavy map side
    (Arrow extractor, md5/norm, shingler) at that width regardless of
    core count — measured as the corpus-DAG anti-scaling in BENCH.md.
    tune_scan_splits sizes the split to the actual input."""
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        tune_scan_splits,
    )

    path = str(tmp_path / "docs.parquet")
    spark.range(200_000).selectExpr(
        "id", "repeat(uuid(), 8) AS text"
    ).repartition(64).write.parquet(path)

    before_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    before_open = spark.conf.get("spark.sql.files.openCostInBytes")
    before_coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
        narrow = spark.read.parquet(path).rdd.getNumPartitions()

        target = tune_scan_splits(spark, path)
        wide = spark.read.parquet(path).rdd.getNumPartitions()

        cores = spark.sparkContext.defaultParallelism
        assert wide > narrow
        assert wide >= min(64, cores)  # per-file cap: 64 files
        assert 256 * 1024 <= target <= 128 * 1024 * 1024
        # compute-dense regime (split < 64MB) also disables AQE
        # partition coalescing, so the explicit shuffle width (sized
        # to balanced waves per core) survives — the round-5 fix for
        # AQE re-packing the dedup DAG's dominant shuffle into
        # ceil(37/32)=2 uneven task waves (see BENCH.md)
        assert spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled") == "false"
        # non-existent / non-local paths contribute nothing and the
        # floor keeps the setting sane
        assert tune_scan_splits(spark, "s3://bucket/prefix") == 256 * 1024
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before_max)
        spark.conf.set("spark.sql.files.openCostInBytes", before_open)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", before_coal)
