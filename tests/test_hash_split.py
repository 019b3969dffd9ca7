"""Deterministic splits/samples: leakage, nesting, stability.

Exact membership is DuckDB-value-hash-oracled through the driver
contract (q_hash_split); this file pins the properties the oracle
doesn't express:
* leakage-freedom — every doc of a source shares one split;
* sample nesting — the 1% sample is a subset of the 10% sample;
* partitioning-independence — membership is a pure function of the
  key, unchanged under repartition (the failure mode of rand()/
  sampleBy sampling);
* plausible proportions at sf0.1 (source-level split, so doc-level
  fractions wobble with source sizes);
* zero-shuffle plans for both operators.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    deterministic_sample,
    hash_split,
)


def _docs(spark, sf="0.001"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")


def test_split_is_leakage_free_and_total(spark):
    out = hash_split(_docs(spark))
    per_source = out.groupBy("source").agg(
        F.countDistinct("split").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_source)
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_samples_nest_and_are_repartition_stable(spark):
    d = _docs(spark)
    s10 = {r["doc_id"] for r in deterministic_sample(d, 0.10).collect()}
    s01 = {r["doc_id"] for r in deterministic_sample(d, 0.01).collect()}
    assert s01 <= s10
    s10_rep = {r["doc_id"]
               for r in deterministic_sample(d.repartition(13), 0.10).collect()}
    assert s10_rep == s10


def test_split_proportions_at_sf01(spark):
    out = hash_split(_docs(spark, "0.1"))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    # 20 sources only -> coarse granularity; train must dominate
    assert counts.get("train", 0) / total > 0.85


def test_zero_shuffle_plans(spark):
    d = _docs(spark)
    for df in (hash_split(d), deterministic_sample(d, 0.1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
