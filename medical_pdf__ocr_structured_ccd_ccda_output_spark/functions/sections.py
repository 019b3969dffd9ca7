"""Clinical section segmentation as JVM array expressions.

Mirrors rules.extract_sections: a header line opens a span; the span
ends on the line before the next header (or EOF).  Built with
transform/filter/slice over the split line array — per-turn, no
explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import rules


def section_name_expr(line: Column) -> Column:
    """First matching section rule wins (priority = rules.SECTION_RULES order)."""
    expr = None
    for name, pat in rules.SECTION_RULES:
        cond = line.rlike(pat)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def sections_expr(text: Column) -> Column:
    """array<struct<section,start_line,end_line,text>> for one turn."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    hdrs = F.filter(
        F.transform(
            lines,
            lambda l, i: F.struct(i.alias("i"), section_name_expr(l).alias("section")),
        ),
        lambda h: h["section"].isNotNull(),
    )

    def mk_span(h: Column, j: Column) -> Column:
        nxt = F.try_element_at(hdrs, j + 2)
        end_line = F.coalesce(nxt["i"], n)
        return F.struct(
            h["section"].alias("section"),
            (h["i"] + 1).alias("start_line"),
            end_line.alias("end_line"),
            F.array_join(
                F.slice(lines, h["i"] + 1, end_line - h["i"]), "\n"
            ).alias("text"),
        )

    return F.transform(hdrs, mk_span)
