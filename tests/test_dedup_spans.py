"""dedup_spans: corpus-wide exact substring-span excision.

The full (doc_id, text, n_words, n_removed) table is DuckDB-oracled
through the driver contract (planted-span corpus); this file pins the
row-level semantics the aggregate hash only witnesses: canonical-copy
retention, whole-doc-duplicate emptying, within-doc repeats, overlap
merging into maximal runs, the short-doc passthrough, and hash-tier
equivalence.
"""

from pyspark.sql import Row

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    dedup_spans,
)

_EX = "one two three four five six seven eight"


def _run(spark, texts, min_len=8, hash_fn="md5"):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return {r["doc_id"]: r for r in dedup_spans(
        df, min_len=min_len, hash_fn=hash_fn).collect()}


def test_canonical_copy_kept_duplicate_excised(spark):
    out = _run(spark, ["alpha beta " + _EX + " gamma",
                       "zeta eta " + _EX + " theta"])
    # doc 0 holds the minimal (doc_id, pos) occurrence -> untouched
    assert out[0]["text"] == "alpha beta " + _EX + " gamma"
    assert out[0]["n_removed"] == 0
    # doc 1's copy is excised, its unique words survive in order
    assert out[1]["text"] == "zeta eta theta"
    assert out[1]["n_removed"] == 8


def test_whole_doc_duplicate_becomes_empty(spark):
    out = _run(spark, [_EX, _EX])
    assert out[0]["text"] == _EX
    assert out[1]["text"] == ""
    assert out[1]["n_words"] == 8
    assert out[1]["n_removed"] == 8


def test_within_doc_repeat_both_removed_when_canonical_elsewhere(spark):
    # doc 1 repeats the excerpt twice; the canonical lives in doc 0, so
    # BOTH of doc 1's occurrences go (keep-one is global, per gram)
    out = _run(spark, [_EX, _EX + " and " + _EX])
    assert out[1]["text"] == "and"
    assert out[1]["n_removed"] == 16


def test_within_doc_repeat_keeps_first_when_no_external_copy(spark):
    out = _run(spark, [_EX + " middle words here " + _EX])
    assert out[0]["text"] == _EX + " middle words here"
    assert out[0]["n_removed"] == 8


def test_overlapping_grams_merge_into_maximal_run(spark):
    # a 12-word shared run: its 5 overlapping 8-grams all duplicate, and
    # their union removes the entire 12-word run from the later doc
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    out = _run(spark, ["head " + run + " tail", "pre " + run + " post"])
    assert out[0]["n_removed"] == 0
    assert out[1]["text"] == "pre post"
    assert out[1]["n_removed"] == 12


def test_short_null_and_unique_docs_pass_through(spark):
    out = _run(spark, ["unique short", None,
                       "nine ten eleven twelve thirteen fourteen fifteen "
                       "sixteen seventeen"])
    assert out[0]["text"] == "unique short" and out[0]["n_removed"] == 0
    assert out[1]["text"] == "" and out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0


def test_hash_tiers_agree(spark):
    texts = ["alpha beta " + _EX + " gamma", "zeta eta " + _EX + " theta",
             _EX, "unique short", _EX + " and " + _EX]
    md5 = _run(spark, texts, hash_fn="md5")
    xx = _run(spark, texts, hash_fn="xxhash64")
    assert {k: tuple(v) for k, v in md5.items()} == \
        {k: tuple(v) for k, v in xx.items()}
