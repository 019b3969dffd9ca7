"""redact_pii: planted-span semantics past the DuckDB oracle.

The full redacted-text + count table is value-hash-oracled through the
driver contract (`redact_pii`); this file pins span claiming (an email's
digits are never double-counted as a phone), phone/SSN disambiguation,
null safety, and the zero-shuffle plan shape.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    redact_pii,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_each_kind_redacted_and_counted(spark):
    d = _df(spark, [
        (1, "mail a.b+c@host.org now"),
        (2, "call 555-123-4567 or 555.987.6543"),
        (3, "ssn 123-45-6789 on file"),
        (4, "clean text with no pii at all"),
        (5, None),
    ])
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["text"] == "mail [EMAIL] now"
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ssns"]) == (1, 0, 0)
    assert out[2]["text"] == "call [PHONE] or [PHONE]"
    assert out[2]["n_phones"] == 2
    assert out[3]["text"] == "ssn [SSN] on file"
    assert out[3]["n_ssns"] == 1 and out[3]["n_phones"] == 0
    assert not out[4]["has_pii"] and out[4]["text"].startswith("clean")
    assert out[5]["text"] == "" and not out[5]["has_pii"]


def test_email_digits_not_double_counted(spark):
    # the local part 555-123-4567 would match the phone pattern on the
    # raw text; counting on the post-email-redaction text must not see it
    d = _df(spark, [(1, "x 555-123-4567@corp.io y")])
    r = redact_pii(d).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 0
    assert r["text"] == "x [EMAIL] y"


def test_phone_ssn_group_shapes_disjoint(spark):
    # 3-3-4 is a phone, 3-2-4 is an SSN; neither pattern claims the other
    d = _df(spark, [(1, "a 123-45-6789 b 123-456-7890 c")])
    r = redact_pii(d).collect()[0]
    assert r["n_ssns"] == 1 and r["n_phones"] == 1
    assert r["text"] == "a [SSN] b [PHONE] c"


def test_zero_shuffle_plan(spark):
    d = _df(spark, [(1, "t")])
    plan = redact_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
