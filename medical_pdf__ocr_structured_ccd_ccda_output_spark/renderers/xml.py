"""CCD/CCDA XML rendering as column expressions (SURVEY S8).

Deterministic analog of the reference's rule-based renderer
(src/renderers/xml_renderer.py:34-69): a ClinicalDocument header plus a
structuredBody with one component per visit.  Built entirely with
concat/format_string over the visit rollup — the XML is a string
column, written like any other sink.  No document id from wall-clock
(the reference stamps datetime.now(); we use conv_id for determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HL7_NAMESPACE = "urn:hl7-org:v3"
ROOT_OID = "2.16.840.1.113883.1.3"


def xml_escape(col: Column) -> Column:
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    col = F.replace(col, F.lit('"'), F.lit("&quot;"))
    return col


def _visit_component() -> Column:
    date_attr = F.coalesce(
        F.date_format(F.col("v.visit_date"), "yyyyMMdd"), F.lit("UNK")
    )
    return F.format_string(
        '    <component>\n'
        '      <section>\n'
        '        <id extension="%s"/>\n'
        '        <effectiveTime value="%s"/>\n'
        '        <title>Visit %s</title>\n'
        '        <text mediaType="text/plain">%s</text>\n'
        '        <entry><observation><value unit="confidence">%.4f</value></observation></entry>\n'
        '      </section>\n'
        '    </component>',
        F.col("v.visit_id"),
        date_attr,
        F.col("v.visit_id"),
        xml_escape(F.col("v.raw_text")),
        F.col("v.confidence"),
    )


def render_ccd_xml(visits: DataFrame) -> DataFrame:
    """visits = visit_rollup output (must include raw_text).
    Returns (conv_id, ccd_xml)."""
    comp = _visit_component()
    per_conv = (
        visits.alias("v")
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("v.visit_id"), comp.alias("xml")))
                    ),
                    lambda s: s["xml"],
                ),
                "\n",
            ).alias("_components"),
            F.count("*").alias("_n_visits"),
            F.bround(F.avg("v.confidence"), 4).alias("_avg_conf"),
        )
    )
    header = F.format_string(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<ClinicalDocument xmlns="%s">\n'
        '  <realmCode code="US"/>\n'
        '  <typeId root="%s" extension="POCD_HD000040"/>\n'
        '  <id root="2.16.840.1.113883.19" extension="doc_%s"/>\n'
        '  <title>Medical Record Summary (OCR-Processed)</title>\n'
        '  <confidentialityCode code="N" codeSystem="2.16.840.1.113883.5.25"/>\n'
        '  <recordTarget><patientRole><id nullFlavor="UNK"/>'
        '<patient><name nullFlavor="UNK"/></patient></patientRole></recordTarget>\n'
        '  <component><structuredBody>\n'
        '%s\n'
        '  </structuredBody></component>\n'
        '</ClinicalDocument>',
        F.lit(HL7_NAMESPACE),
        F.lit(ROOT_OID),
        F.col("conv_id"),
        F.col("_components"),
    )
    return per_conv.select("conv_id", header.alias("ccd_xml"))
