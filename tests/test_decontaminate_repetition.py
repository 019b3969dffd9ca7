"""decontaminate + repetition_stats: properties past the DuckDB oracle.

Both operators' full output tables are value-hash-oracled through the
driver contract (__spark_entry__ `decontaminate` / `repetition_stats`);
this file pins semantics on planted inputs (known contamination, closed-
form repetition fractions), hit-multiplicity invariance, the broadcast
shape of the eval join, and one-row-per-doc totality.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    decontaminate,
    repetition_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination(spark):
    evals = _df(spark, [(900, "alpha beta gamma delta epsilon")])
    corpus = _df(spark, [
        (1, "prefix alpha beta gamma delta suffix"),   # shares a 4-gram
        (2, "totally unrelated words only here now"),  # clean
        (3, "beta gamma delta epsilon and more text"), # shares a 4-gram
    ])
    out = {r["doc_id"]: r for r in
           decontaminate(corpus, evals, shingle_n=4).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["matched_evals"] == "900"
    assert out[1]["n_hit_shingles"] == 1
    assert out[3]["contaminated"] and out[3]["n_hit_shingles"] == 1
    assert not out[2]["contaminated"]
    assert out[2]["n_hit_shingles"] == 0 and out[2]["matched_evals"] == ""


def test_hit_multiplicity_irrelevant_and_multi_eval(spark):
    evals = _df(spark, [(7, "one two three four"), (3, "one two three four")])
    # the shared 4-gram occurs twice in the corpus doc: the flag counts
    # DISTINCT shared grams, so multiplicity must not inflate it
    corpus = _df(spark, [(1, "one two three four and one two three four")])
    row = decontaminate(corpus, evals, shingle_n=4).collect()[0]
    assert row["n_hit_shingles"] == 1
    assert row["matched_evals"] == "3,7"  # numeric sort, then joined


def test_eval_side_is_broadcast(spark):
    evals = _df(spark, [(9, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d e"), (2, "f g h i j")])
    plan = (decontaminate(corpus, evals, shingle_n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_closed_form(spark):
    d = _df(spark, [(1, "a b\na b\nc d")])
    r = repetition_stats(d).collect()[0]
    assert r["n_lines"] == 3 and r["n_distinct_lines"] == 2
    # one duplicate occurrence of 'a b' (3 chars) out of 9 line chars
    assert r["dup_line_fraction"] == round(1 / 3, 6)
    assert r["dup_char_fraction"] == round(3 / 9, 6)
    # norm tokens [a,b,a,b,c,d] -> bigrams: 'a b','b a','a b','b c','c d'
    assert r["top_bigram_count"] == 2
    assert r["top_bigram_fraction"] == round(2 / 5, 6)


def test_repetition_degenerate_and_empty(spark):
    d = _df(spark, [(1, "x\nx\nx\nx"), (2, ""), (3, None)])
    out = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert len(out) == 3  # one row per input doc, nulls included
    assert out[1]["dup_line_fraction"] == 0.75
    assert out[1]["dup_char_fraction"] == 0.75
    for i in (2, 3):
        assert out[i]["n_lines"] == 0
        assert out[i]["dup_line_fraction"] == 0.0
        assert out[i]["top_bigram_count"] == 0
        assert out[i]["top_bigram_fraction"] == 0.0


def test_totality_on_real_table(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = d.count()
    assert repetition_stats(d).count() == n
    evals = d.limit(5)
    assert decontaminate(d, evals).count() == n
