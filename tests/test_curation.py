"""curate_corpus: properties past the DuckDB oracle.

The composed pipeline's full decision table is value-hash-oracled
through the driver contract (`corpus_curation`); this file pins the
composition semantics: signal parity with the standalone operators
(the refactored shared expressions make drift impossible by
construction — these tests keep it that way), the first-failing-rule
priority order, the duplicate-group survivor invariant, decontamination
wiring, and totality.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    curate_corpus,
    quality_scores,
    redact_pii,
    token_counts,
)

GOOD = ("the committee and the board reviewed the plan with care and "
        "agreed that the work is of value to the members " * 3)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_curation_matches_standalone_ops(spark):
    d = _docs(spark, [
        (1, "s1", GOOD + " mail me a@b.io or 555-123-4567"),
        (2, "s1", "short"),
        (3, "s2", GOOD),
    ])
    out = {r["doc_id"]: r for r in curate_corpus(d).collect()}
    red = redact_pii(d)
    toks = {r["doc_id"]: r for r in token_counts(red).collect()}
    quals = {r["doc_id"]: r
             for r in quality_scores(red, round_to=None).collect()}
    piis = {r["doc_id"]: r for r in red.collect()}
    for i in (1, 2, 3):
        assert out[i]["n_tokens"] == toks[i]["ws_tokens"]
        assert out[i]["quality_score"] == quals[i]["quality_score"]
        assert out[i]["has_pii"] == piis[i]["has_pii"]


def test_first_failing_rule_priority(spark):
    dup = GOOD + " unique tail zq"
    d = _docs(spark, [
        (1, "s1", "tiny"),                     # too_short
        (2, "s1", "x " * 300),                 # low_quality (degenerate)
        (3, "s1", dup),                        # kept canonical
        (4, "s1", dup),                        # duplicate of 3
        (5, "s1", GOOD + " other tail aa"),    # kept
        (6, "s1", None),                       # too_short (0 tokens)
    ])
    out = {r["doc_id"]: r for r in
           curate_corpus(d, min_tokens=5, min_quality=0.5).collect()}
    assert out[1]["drop_reason"] == "too_short" and not out[1]["keep"]
    assert out[2]["drop_reason"] == "low_quality"
    assert out[3]["keep"] and out[3]["drop_reason"] == ""
    assert out[4]["drop_reason"] == "duplicate"
    assert out[4]["canonical_id"] == 3
    assert out[5]["keep"]
    assert out[6]["drop_reason"] == "too_short"
    for r in out.values():
        assert r["keep"] == (r["drop_reason"] == "")


def test_duplicate_group_one_survivor_invariant(spark):
    # every signal is a pure function of the redacted text, so a
    # duplicate group either fails together on an earlier rule or
    # keeps exactly its canonical member
    d = _docs(spark, [(i, "s1", GOOD) for i in range(10, 15)]
              + [(j, "s1", "zz qq zz qq") for j in (20, 21)])
    out = curate_corpus(d, min_tokens=3, min_quality=0.5).collect()
    good = [r for r in out if r["canonical_id"] == 10]
    assert len(good) == 5
    assert sorted(r["doc_id"] for r in good if r["keep"]) == [10]
    assert all(r["drop_reason"] == "duplicate"
               for r in good if r["doc_id"] != 10)
    junk = [r for r in out if r["canonical_id"] == 20]
    # whole group fails the same earlier rule; none read 'duplicate'
    assert len(junk) == 2
    assert all(r["drop_reason"] == "low_quality" for r in junk)


def test_decontamination_wiring_and_reason_order(spark):
    # doc 2 is an exact dup of doc 1 AND contaminated; contamination
    # outranks duplicate in the priority chain
    evals = spark.createDataFrame(
        [(900, GOOD)], "doc_id long, text string")
    d = _docs(spark, [
        (1, "s1", GOOD),
        (2, "s1", GOOD),
        (3, "s1", "the committee of nobody shares any grams here with "
                  "them and this text stays long enough to pass the "
                  "filters of the pipeline easily " * 2),
    ])
    out = {r["doc_id"]: r for r in
           curate_corpus(d, evals, shingle_n=4, min_quality=0.2).collect()}
    assert out[1]["contaminated"] and out[1]["drop_reason"] == "contaminated"
    assert out[2]["contaminated"] and out[2]["drop_reason"] == "contaminated"
    assert not out[3]["contaminated"] and out[3]["keep"]


def test_signal_udf_matches_jvm_exprs(spark):
    # the Arrow signals UDF must be value-identical to the JVM
    # expression tier on edge cases: null, empty, whitespace-padded,
    # punct-heavy, unicode NBSP/NEL (where both sides use the ASCII
    # \s class), long text, stopword-free, every ASCII-\s separator
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
        quality_exprs,
        signal_scores_udf,
        ws_token_expr,
    )
    rows = [
        (1, None), (2, ""), (3, "   \n\t  "), (4, "one"),
        (5, "a b c d e f g h i j " * 30),
        (6, "!!! ??? ... ;;; ::: @@@"),
        (7, "the nbsp staysnel here"),
        (8, "mixed CASE Text with the and of words"),
        (9, "zz qq ww ee rr tt yy uu"),
        (10, "tab\tsep\nnewline\x0bvtab\fff\rcr end"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sc = signal_scores_udf()(F.col("text"))
    udf_out = {r["doc_id"]: r for r in d.select(
        "doc_id", sc["n_tokens"].alias("nt"), sc["quality_score"].alias("q")
    ).collect()}
    jvm_out = {r["doc_id"]: r for r in d.select(
        "doc_id",
        ws_token_expr(F.col("text")).cast("long").alias("nt"),
        quality_exprs(F.col("text"))["quality_score"].alias("q"),
    ).collect()}
    for i, _ in rows:
        assert udf_out[i]["nt"] == jvm_out[i]["nt"], i
        assert udf_out[i]["q"] == jvm_out[i]["q"], i


def test_signal_udf_property_parity(spark):
    # hypothesis fuzz over the PY_WS/unicode parity surface (the
    # test_property_parity idiom: batch per example so shrinking still
    # isolates one string): the Arrow UDF and the JVM tier must agree
    # on generated adversarial text, not just curated cases
    import string

    from hypothesis import HealthCheck, given, settings, strategies as st

    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
        quality_exprs,
        signal_scores_udf,
        ws_token_expr,
    )

    raw = st.text(
        alphabet=string.ascii_letters + string.digits + string.punctuation
        + " \t\n\r\x0b\x0c\x1c\x85\xa0" + "éñ±",
        max_size=60,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(raw, min_size=12, max_size=12))
    def check(texts):
        d = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        sc = signal_scores_udf()(F.col("text"))
        u = {r["doc_id"]: r for r in d.select(
            "doc_id", sc["n_tokens"].alias("nt"),
            sc["quality_score"].alias("q")).collect()}
        j = {r["doc_id"]: r for r in d.select(
            "doc_id",
            ws_token_expr(F.col("text")).cast("long").alias("nt"),
            quality_exprs(F.col("text"))["quality_score"].alias("q"),
        ).collect()}
        for i, t in enumerate(texts):
            assert u[i]["nt"] == j[i]["nt"], (i, repr(t))
            assert u[i]["q"] == j[i]["q"], (i, repr(t))

    check()


def test_split_is_source_consistent(spark):
    d = _docs(spark, [(i, f"src{i % 4}", GOOD + f" tail {i}")
                      for i in range(40)])
    out = curate_corpus(d).collect()
    assert len(out) == 40
    per_source = {}
    for r in out:
        per_source.setdefault(r["source"], set()).add(r["split"])
        assert r["split"] in ("train", "val", "test")
    # leakage defense: one split per source
    assert all(len(s) == 1 for s in per_source.values())
