"""corpus_profile: exact columns + HLL sketch tolerance + plan shape.

The exact columns are DuckDB-value-hash-oracled through the driver
contract (q_corpus_profile); this file pins what the oracle can't:
the HLL++ approx-distinct column stays within its configured error of
the exact count, and the whole rollup is ONE exchange keyed on the
group column (the sketch and every min/max/sum partial ride the same
shuffle; count(DISTINCT) adds its expand-based second phase but no
extra scan).
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    corpus_profile,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_sketch_within_tolerance_of_exact(spark):
    rows = corpus_profile(_docs(spark)).collect()
    assert rows
    for r in rows:
        exact, approx = r["n_distinct_contents"], r["approx_distinct_contents"]
        # rsd 0.025 -> generous 4-sigma band; tiny groups are exact-ish
        assert abs(approx - exact) <= max(4, 0.10 * exact), (
            r["source"], exact, approx)


def test_median_and_bounds_consistent(spark):
    rows = corpus_profile(_docs(spark)).collect()
    for r in rows:
        assert r["min_chars"] <= r["median_chars"] <= r["max_chars"]
        assert r["n_distinct_contents"] <= r["n_docs"]
        assert r["total_chars"] >= r["max_chars"]


def test_single_exchange_plan(spark):
    plan = corpus_profile(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    # count(DISTINCT) planning: partial -> Exchange(group, key-ish) ->
    # merge -> Exchange(group) -> final.  No more than the two
    # aggregate exchanges, and no join/cartesian anywhere.
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan and "Cartesian" not in plan
