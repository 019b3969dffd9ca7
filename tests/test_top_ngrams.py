"""top_ngrams: corpus-wide heavy-hitter semantics + plan shape.

The full top-k result is DuckDB-oracled through the driver contract;
this file pins what the oracle doesn't express: exact counts on a
constructed corpus, the deterministic tie-break at the k boundary, the
min_docs filter, short/empty/null docs contributing nothing, and the
one-exchange + TakeOrderedAndProject physical plan.
"""

from pyspark.sql import Row

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    top_ngrams,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_counts_and_doc_freq(spark):
    d = _corpus(spark, [
        "the quick brown fox the quick brown",  # "the quick brown" x2
        "THE  Quick\tBrown fox jumps",          # normalization folds in
        "a different document entirely here",
    ])
    rows = {r["ngram"]: r for r in top_ngrams(d, n=3, k=10, min_docs=2).collect()}
    assert rows["the quick brown"]["occurrences"] == 3
    assert rows["the quick brown"]["doc_freq"] == 2
    assert rows["quick brown fox"]["occurrences"] == 2
    assert rows["quick brown fox"]["doc_freq"] == 2
    # single-doc grams are filtered by min_docs=2
    assert "a different document" not in rows
    assert all(r["doc_freq"] >= 2 for r in rows.values())


def test_tie_break_and_k_boundary(spark):
    # every sliding trigram of the doc is tied at occurrences=2
    # (each appears once per doc); k=2 must take the two
    # lexicographically smallest (occurrences DESC, ngram ASC)
    d = _corpus(spark, [
        "b b b c c c a a a d d d",
        "b b b c c c a a a d d d",
    ])
    got = [r["ngram"] for r in top_ngrams(d, n=3, k=2, min_docs=2).collect()]
    assert got == ["a a a", "a a d"]


def test_short_empty_null_docs_contribute_nothing(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text="one two"),      # < n words
         Row(doc_id=1, text="   "),           # whitespace-only
         Row(doc_id=2, text=None),            # null
         Row(doc_id=3, text="x y z"),
         Row(doc_id=4, text="x y z")],
    )
    rows = top_ngrams(d, n=3, k=10, min_docs=1).collect()
    assert {r["ngram"] for r in rows} == {"x y z"}
    assert rows[0]["doc_freq"] == 2


def test_plan_one_exchange_take_ordered(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = top_ngrams(d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # only the ngram groupBy
    assert "TakeOrderedAndProject" in plan    # top-k, never a global sort
