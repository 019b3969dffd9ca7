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

# name then optional dose (number+unit) then the rest as frequency/route
_MED_LINE = r"^\s*(?:\d+[.)]\s*)?([A-Za-z][A-Za-z \-]*?)\s+(\d+(?:\.\d+)?\s*(?:mg|mcg|g|ml|units?))\b\s*(.*)$"
_PROBLEM_SECTIONS = ("PAST MEDICAL HISTORY", "ASSESSMENT", "IMPRESSION")
_LAB_LINE = r"^\s*([A-Za-z][A-Za-z0-9 ]*?)\s*\|\s*([^|]+?)\s*\|\s*([^|]+?)\s*(?:\|\s*([^|]*?)\s*)?$"


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
            F.regexp_replace(m(2), r"\s+", "").alias("dose"),
            F.nullif(F.trim(m(3)), F.lit("")).alias("frequency"),
            F.lit(None).cast("string").alias("route"),
            F.col("turn_idx").alias("source_page"),
            F.col("line_no").alias("source_line_in_turn"),
        )
    )


def extract_problems(turns: DataFrame) -> DataFrame:
    lines = _section_lines(turns, _PROBLEM_SECTIONS)
    cleaned = F.regexp_replace(F.col("line"), r"^\s*[-*•]\s*", "")
    return (
        lines.filter(F.col("line").rlike(r"^\s*[-*•]\s*\S"))
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
