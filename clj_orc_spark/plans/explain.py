"""Physical-plan auditors: assert the plan Catalyst produced is the plan we
want at 100 TB — filters pushed to the scan, columns pruned, codegen intact.

The reference does neither pushdown nor pruning (bare reader options,
`src/orc/read.clj:53` — every column materializes per batch regardless of the
handler list; SURVEY.md §4.1 "Not implemented").  Spark gives both for free
*if* the plan is declared properly; these helpers make that a testable
invariant instead of a hope.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause of the scan node ('' if none)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.split("PushedFilters:", 1)[1].strip()
    return ""


def read_schema(df: DataFrame) -> str:
    plan = explain_str(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans (the ``*(n)`` markers in simple mode).

    Under AQE the pre-execution plan is an unfinalized AdaptiveSparkPlan with
    NO ``*(n)`` markers at all — counting before an action always yields 0
    (the round-1 PLANS.md mistake).  Use :func:`executed_codegen_count` for
    the real number."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))


def executed_codegen_count(df: DataFrame) -> int:
    """Execute the DataFrame's own query (finalizing its AdaptiveSparkPlan),
    then count WholeStageCodegen spans in the final physical plan."""
    df.collect()
    return wholestage_codegen_count(df)


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, f"filter on {column!r} not pushed to scan: {pf!r}"


def assert_columns_pruned(df: DataFrame, needed: list[str], absent: list[str]) -> None:
    rs = read_schema(df)
    for c in needed:
        assert c in rs, f"column {c!r} missing from ReadSchema {rs!r}"
    for c in absent:
        assert c not in rs, f"column {c!r} NOT pruned from ReadSchema {rs!r}"
