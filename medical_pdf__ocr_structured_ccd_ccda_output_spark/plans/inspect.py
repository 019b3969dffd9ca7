"""Physical-plan inspection helpers — used by tests to pin the plan
shapes that matter at 100 TB (pushdown, broadcast, shuffle count)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle (non-broadcast) exchanges in the physical plan."""
    plan = formatted_plan(df)
    return sum(
        1 for line in plan.splitlines()
        if line.lstrip("+-: ").startswith("Exchange")
    )


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(
        1 for line in plan.splitlines()
        if "BroadcastHashJoin" in line or "BroadcastNestedLoopJoin" in line
    )


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in formatted_plan(df) and \
        "PushedFilters: []" not in formatted_plan(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(p.split(":")[0] for p in m.group(1).split(",") if p)
    return cols
