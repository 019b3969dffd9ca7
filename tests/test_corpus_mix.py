"""corpus_mix: weighted deterministic mixing properties.

Exact membership is DuckDB-oracled through the driver contract; this
file pins what the oracle doesn't express: raising one source's weight
strictly grows (never reshuffles) its kept set, unknown sources follow
default_rate, and the plan is a pure zero-shuffle filter.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    corpus_mix,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_weight_increase_nests(spark):
    d = _docs(spark)
    low = {f"src{i}": 0.2 for i in range(20)}
    high = dict(low, src3=0.8)
    kept_low = {r["doc_id"] for r in corpus_mix(d, low).collect()}
    kept_high = {r["doc_id"] for r in corpus_mix(d, high).collect()}
    assert kept_low <= kept_high
    grew = kept_high - kept_low
    assert grew
    src3_ids = {r["doc_id"] for r in d.filter(F.col("source") == "src3")
                .select("doc_id").collect()}
    assert grew <= src3_ids  # only the re-weighted source changed


def test_default_rate_and_zero_weight(spark):
    d = _docs(spark)
    only_src0 = corpus_mix(d, {"src0": 1.0})
    assert only_src0.filter(F.col("source") != "src0").count() == 0
    assert only_src0.count() == d.filter(F.col("source") == "src0").count()
    half_default = corpus_mix(d, {"src0": 1.0}, default_rate=1.0)
    assert half_default.count() == d.count()


def test_zero_shuffle_plan(spark):
    plan = (corpus_mix(_docs(spark), {"src0": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
