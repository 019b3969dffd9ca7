"""salient_terms: tf*N/df keyword ranking properties.

The full (doc, rank, term, tf, df, score) table is DuckDB-oracled
through the driver contract; this file pins the ranking semantics the
oracle only witnesses: the idf effect (a rare term outranks a more
frequent common one), deterministic tie-break, null/empty docs, and
the k bound with contiguous ranks.
"""

from pyspark.sql import Row

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    salient_terms,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_rare_term_outranks_frequent_common_one(spark):
    # doc0: "common" tf=3 but df=3 (score 3*3/3=3); "rare" tf=1 df=1
    # (score 1*3/1=3)... make rare strictly win: tf=2 -> score 6
    d = _corpus(spark, [
        "rare rare common common common",
        "common filler words here",
        "common other filler words",
    ])
    top = {r["rank"]: r for r in salient_terms(d, k=2).collect()
           if r["doc_id"] == 0}
    assert top[1]["term"] == "rare"
    assert top[1]["score"] == 6.0          # 2 * 3 / 1
    assert top[2]["term"] == "common"
    assert top[2]["score"] == 3.0          # 3 * 3 / 3


def test_tie_break_on_term(spark):
    # both terms tf=1, df=1 -> equal score; term ASC decides rank
    d = _corpus(spark, ["zebra apple", "unrelated filler"])
    rows = sorted(
        (r for r in salient_terms(d, k=5).collect() if r["doc_id"] == 0),
        key=lambda r: r["rank"],
    )
    assert [r["term"] for r in rows] == ["apple", "zebra"]


def test_null_and_empty_docs_emit_nothing(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text=None),
         Row(doc_id=1, text="   "),
         Row(doc_id=2, text="solo words")],
    )
    rows = salient_terms(d, k=5).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_k_bound_and_contiguous_ranks(spark):
    d = _corpus(spark, ["a b c d e f g h", "a b c d e f g h"])
    rows = [r for r in salient_terms(d, k=3).collect() if r["doc_id"] == 0]
    assert sorted(r["rank"] for r in rows) == [1, 2, 3]
