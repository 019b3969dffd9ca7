"""Rule-based entity extraction from section spans (structuring analog).

The reference's structuring stage is an LLM call; the graft replaces it
with deterministic line-based parsing of the already-segmented sections
(MEDICATIONS / problem-bearing / LABORATORY), per the extraction tier's
north star.  All parsing is JVM regex — entities are exploded from the
sections array, no Python.

Output schemas follow FIXTURES.md §3 so the dedup stage can consume
either these extracted entities or externally-provided entity tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import rules
from ..functions.cleaning import PY_WS, strip_ws

# name then optional dose (number+unit) then the rest as frequency/route
# (engine_portable: \s means Python-unicode whitespace in every grammar
# of this module — an NBSP-indented med line must still parse)
_MED_LINE = rules.java_portable(
    r"^\s*(?:\d+[.)]\s*)?([A-Za-z][A-Za-z \-]*?)\s+(\d+(?:\.\d+)?\s*(?:mg|mcg|g|ml|units?))\b\s*(.*)$"
)
_PROBLEM_SECTIONS = ("PAST MEDICAL HISTORY", "ASSESSMENT", "IMPRESSION")
_LAB_LINE = rules.java_portable(
    r"^\s*([A-Za-z][A-Za-z0-9 ]*?)\s*\|\s*([^|]+?)\s*\|\s*([^|]+?)\s*(?:\|\s*([^|]*?)\s*)?$"
)


def _section_lines(turns: DataFrame, section_names: tuple[str, ...]) -> DataFrame:
    """Explode matching sections into (conv_id, visit_id, turn_idx, line_no,
    line) rows; line_no is the absolute line number within the turn."""
    sec = F.explode(
        F.filter(F.col("sections"), lambda s: s["section"].isin(*section_names))
    ).alias("sec")
    base = turns.select("conv_id", "visit_id", "turn_idx", sec)
    line = F.posexplode(F.split(F.col("sec.text"), "\n")).alias("pos", "line")
    return base.select(
        "conv_id", "visit_id", "turn_idx",
        F.col("sec.section").alias("section"),
        F.col("sec.start_line").alias("section_start"),
        line,
    ).withColumn("line_no", F.col("section_start") + F.col("pos")) \
     .filter(F.col("pos") > 0)  # skip the header line itself


def extract_medications(turns: DataFrame) -> DataFrame:
    lines = _section_lines(turns, ("MEDICATIONS",))
    m = lambda g: F.regexp_extract(F.col("line"), _MED_LINE, g)  # noqa: E731
    return (
        lines.filter(F.col("line").rlike(_MED_LINE))
        .select(
            "conv_id", "visit_id",
            F.trim(m(1)).alias("name"),
            F.regexp_replace(m(2), f"{PY_WS}+", "").alias("dose"),
            F.nullif(F.trim(m(3)), F.lit("")).alias("frequency"),
            F.lit(None).cast("string").alias("route"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
    )


def extract_problems(turns: DataFrame) -> DataFrame:
    lines = _section_lines(turns, _PROBLEM_SECTIONS)
    cleaned = F.regexp_replace(
        F.col("line"), rules.java_portable(r"^\s*[-*•]\s*"), ""
    )
    return (
        lines.filter(F.col("line").rlike(rules.java_portable(r"^\s*[-*•]\s*\S")))
        .select(
            "conv_id", "visit_id",
            F.trim(cleaned).alias("problem"),
            F.lit(None).cast("string").alias("icd10_code"),
            F.lit(None).cast("string").alias("status"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
    )


def extract_lab_results(turns: DataFrame) -> DataFrame:
    """Pipe-delimited lab rows: test | value | unit [| flag]."""
    lines = _section_lines(turns, ("LABORATORY",))
    g = lambda i: F.regexp_extract(F.col("line"), _LAB_LINE, i)  # noqa: E731
    return (
        lines.filter(F.col("line").rlike(_LAB_LINE))
        .select(
            "conv_id", "visit_id",
            F.trim(g(1)).alias("test_name"),
            F.trim(g(2)).alias("value"),
            F.nullif(F.trim(g(3)), F.lit("")).alias("unit"),
            F.lit(None).cast("string").alias("reference_range"),
            F.nullif(F.trim(g(4)), F.lit("")).alias("abnormal_flag"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
    )


# ---------------------------------------------------------------------------
# Vitals / allergies / plan (canonical_schema.py:64-94,140-180; line
# grammar defined in rules.py §13, shared with the pytest oracle)
# ---------------------------------------------------------------------------

_BULLET = rules.java_portable(rules.BULLET_PREFIX_PATTERN)


def _canonical_vital_expr(label):
    """Normalized-label -> canonical vital key (exact-equality when-chain
    over rules.VITAL_LABEL_MAP)."""
    norm = F.trim(F.regexp_replace(F.lower(label), f"{PY_WS}+", " "))
    expr = F.lit(None).cast("string")
    for key, canonical in reversed(rules.VITAL_LABEL_MAP):
        expr = F.when(norm == key, F.lit(canonical)).otherwise(expr)
    return expr


def extract_vitals(turns: DataFrame) -> DataFrame:
    """VITAL SIGNS section lines -> one row per recognized vital with the
    BloodPressure range validation flag (40-300 / 20-200,
    canonical_schema.py:75-76).  Pure JVM regex."""
    lines = _section_lines(turns, ("VITAL SIGNS",))
    vital_pat = rules.java_portable(rules.VITAL_LINE_PATTERN)
    g = lambda i: F.regexp_extract(F.col("line"), vital_pat, i)  # noqa: E731
    parsed = (
        lines.filter(F.col("line").rlike(vital_pat))
        .select(
            "conv_id", "visit_id",
            _canonical_vital_expr(g(1)).alias("vital_name"),
            F.nullif(g(2), F.lit("")).cast("double").alias("_v1"),
            F.nullif(g(3), F.lit("")).cast("double").alias("_v2"),
            F.nullif(g(4), F.lit("")).alias("_unit"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
        .filter(F.col("vital_name").isNotNull())
    )
    is_bp = F.col("vital_name") == "blood_pressure"
    # slash form belongs to BP only; BP without the slash form is dropped
    parsed = parsed.filter(
        (is_bp & F.col("_v2").isNotNull())
        | (~is_bp & F.col("_v2").isNull())
    )
    lo_s, hi_s = rules.BP_SYSTOLIC_RANGE
    lo_d, hi_d = rules.BP_DIASTOLIC_RANGE
    return parsed.select(
        "conv_id", "visit_id", "vital_name",
        F.when(~is_bp, F.col("_v1")).alias("value"),
        F.when(is_bp, F.col("_v1")).alias("systolic"),
        F.when(is_bp, F.col("_v2")).alias("diastolic"),
        F.when(is_bp, F.coalesce(F.col("_unit"), F.lit("mmHg")))
        .otherwise(F.col("_unit")).alias("unit"),
        F.when(
            is_bp,
            F.col("_v1").between(lo_s, hi_s) & F.col("_v2").between(lo_d, hi_d),
        ).otherwise(F.lit(True)).alias("bp_valid"),
        "source_page", "source_line_in_turn",
    )


def extract_allergies(turns: DataFrame) -> DataFrame:
    """ALLERGIES section lines -> substance strings (bullets stripped,
    no-allergy markers dropped — rules.ALLERGY_NEGATIONS)."""
    lines = _section_lines(turns, ("ALLERGIES",))
    # strip_ws, not F.trim: rules.parse_allergy_line strips ALL
    # whitespace (tabs, \r from CRLF payloads), trim only spaces
    substance = strip_ws(F.regexp_replace(F.col("line"), _BULLET, ""))
    norm = F.trim(F.regexp_replace(F.lower(substance), f"{PY_WS}+", " "))
    return (
        lines.select(
            "conv_id", "visit_id",
            substance.alias("substance"),
            norm.alias("_norm"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
        .filter(
            (F.col("substance") != "")
            & ~F.col("_norm").isin(*sorted(rules.ALLERGY_NEGATIONS))
        )
        .drop("_norm")
    )


def _plan_category_expr(action):
    low = F.lower(action)
    expr = F.lit("other")
    for key, cat in reversed(rules.PLAN_CATEGORY_RULES):
        expr = F.when(low.contains(key), F.lit(cat)).otherwise(expr)
    return expr


def extract_plan_items(turns: DataFrame) -> DataFrame:
    """PLAN section lines -> PlanItem rows with the ordered-keyword
    category (rules.PLAN_CATEGORY_RULES; enums.py PlanCategory)."""
    lines = _section_lines(turns, ("PLAN",))
    # strip_ws matches rules.parse_plan_line's .strip() (see allergies)
    action = strip_ws(F.regexp_replace(F.col("line"), _BULLET, ""))
    return (
        lines.select(
            "conv_id", "visit_id",
            action.alias("action"),
            _plan_category_expr(action).alias("category"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
        .filter(F.col("action") != "")
    )


def extract_visit_texts(turns: DataFrame) -> DataFrame:
    """Visit-level text fields (canonical_schema.py:168-179): the body
    text of CHIEF COMPLAINT / REASON FOR VISIT / HPI / ASSESSMENT
    sections, concatenated in document order per (conv_id, visit_id).
    Returns (conv_id, visit_id, field, text, source_page,
    source_line_in_turn) — one row per contributing section span."""
    names = tuple(rules.VISIT_TEXT_SECTIONS)
    sec = F.explode(
        F.filter(F.col("sections"), lambda s: s["section"].isin(*names))
    ).alias("sec")
    base = turns.select("conv_id", "visit_id", "turn_idx", sec)
    field = F.lit(None).cast("string")
    for name, canonical in reversed(list(rules.VISIT_TEXT_SECTIONS.items())):
        field = F.when(F.col("sec.section") == name, F.lit(canonical)) \
            .otherwise(field)
    # body = inline content after the header colon (the `HEADER: text`
    # form, common for CHIEF COMPLAINT) + the span's remaining lines
    first_line = F.regexp_extract(F.col("sec.text"), r"^([^\n]*)", 1)
    inline = F.when(
        first_line.contains(":"),
        F.trim(F.regexp_replace(first_line, r"^[^:]*:", "")),
    ).otherwise(F.lit(""))
    rest = F.regexp_replace(F.col("sec.text"), r"^[^\n]*\n?", "")
    body = (
        F.when((inline != "") & (rest != ""),
               F.concat(inline, F.lit("\n"), rest))
        .when(inline != "", inline)
        .otherwise(rest)
    )
    return base.select(
        "conv_id", "visit_id",
        field.alias("field"),
        body.alias("text"),
        F.col("turn_idx").alias("source_page"),
        F.col("sec.start_line").alias("source_line_in_turn"),
    ).filter(F.col("text") != "")


def visit_text_fields(turns: DataFrame) -> DataFrame:
    """Pivoted per-visit form: (conv_id, visit_id, reason_for_visit,
    history_of_present_illness, assessment) — document-order '\\n'
    concatenation when a field spans several turns."""
    rows = extract_visit_texts(turns)
    ordered = F.struct("source_page", "source_line_in_turn",
                       F.col("text").alias("t"))
    agg = rows.groupBy("conv_id", "visit_id").agg(*[
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("field") == f, ordered))
                ),
                lambda s: s["t"],
            ),
            "\n",
        ).alias(f)
        for f in ("reason_for_visit", "history_of_present_illness",
                  "assessment")
    ])
    return agg
