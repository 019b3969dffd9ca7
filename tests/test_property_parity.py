"""Property-based (hypothesis) parity: the JVM column-expression
extractor must agree with the pure-Python rule spec (`rules.py`) on
ADVERSARIAL generated text, not just the curated fixtures — the same
dual-implementation invariant bench.py measures over the corpus
(per-turn equality), pushed into the weird corners of the input space.

Each hypothesis example is a BATCH of strings run through one Spark
job (per-example jobs would be pathologically slow), so shrinking
still isolates a single offending string."""

import string

from hypothesis import HealthCheck, example, given, settings, strategies as st

from medical_pdf__ocr_structured_ccd_ccda_output_spark import rules

# alphabet biased toward the rule grammar's trigger characters:
# whitespace runs, page-banner/pipe/table chars, UNCLEAR markers,
# ambiguous OCR chars, dates, section headers, unicode
_FRAGMENTS = st.sampled_from([
    "[UNCLEAR: xy]", "[UNCLEAR", "Page 3 of 9", "|", "      ",
    "Visit Date: 03/15/2024", "DOB: 1/2/99", "MEDICATIONS", "PLAN",
    "HTN DM2 BID", "l1lI O0O", "~~~", "(?)", "\n\n\n", "\t",
    "café ñ 中文 ↑ ±", "signature illegible", "\r\n", "  -  ",
])
_RAW = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation
    + " \t\n\r" + "éñ↑±中",
    max_size=80,
)
_DOC = st.lists(st.one_of(_RAW, _FRAGMENTS), min_size=0, max_size=12).map(
    " ".join
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=16, max_size=16))
@example(
    # regression: 'O:P"ñ' must NOT count as an uppercase abbreviation —
    # an ASCII-only [^a-z] class let the cased-lowercase ñ through,
    # tipping abbrevs to 6 and diverging confidence by 0.05.
    docs=['signature illegible O:P"ñ \r\n        VG±\rCH5Jj( [UNCLEAR .M '
          'HTN DM2 BID  (?) 2w5@=C]\n\rQW|#c\n       '] + [""] * 15,
)
def test_extractor_parity_on_generated_text(docs):
    from pyspark.sql import functions as F

    from medical_pdf__ocr_structured_ccd_ccda_output_spark.functions.cleaning import (
        clean_text_expr,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.functions.confidence import (
        confidence_expr,
    )
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import (
        get_spark,
    )

    spark = get_spark("prop", shuffle_partitions=4)
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = df.select(
        clean_text_expr(F.col("text")).alias("clean"),
        confidence_expr(clean_text_expr(F.col("text"))).alias("conf"),
    ).collect()
    for doc, row in zip(docs, got):
        want_clean = rules.clean_text(doc)
        assert row["clean"] == want_clean, repr(doc)
        assert row["conf"] == rules.score_confidence(want_clean), repr(doc)
