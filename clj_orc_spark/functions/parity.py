"""Scalar-function parity layer: the reference's T/J kernels as Spark exprs.

Each helper mirrors one scalar decode/serialize kernel from the reference
(SURVEY.md §2.1 T1–T5, J1–J3) using built-in, codegen'd Spark functions —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def date_to_string(col: Column) -> Column:
    """T3 `parse-long->date` (`src/orc/col.clj:58-62`): days-since-epoch →
    'yyyy-MM-dd' UTC string."""
    return F.date_format(col, "yyyy-MM-dd")


def timestamp_to_string(col: Column) -> Column:
    """T4 `parse-timestamp` (`src/orc/col.clj:64-68`): millis →
    'yyyy-MM-dd HH:mm:ss' UTC string."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def nan_to_null(col: Column) -> Column:
    """T5 `parse-double` NaN→nil normalization (`src/orc/col.clj:70-75`).

    The encode engine deliberately does NOT apply this (bit identity); it is
    exposed for API parity with the reference's decode behavior.
    """
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


def utf8_byte_count(col: Column) -> Column:
    """J2 `byte-count` (`src/orc/json.clj:25-28`): UTF-8 byte length."""
    return F.octet_length(col)


def json_record(*cols: Column) -> Column:
    """J1 `jsonify` (`src/orc/json.clj:19-23`): row → JSON string."""
    return F.to_json(F.struct(*cols))


def byte_budget_chunk_id(byte_col: Column, order_col: Column, budget: int) -> Column:
    """J3/J5 byte-limited chunk assignment (`src/orc/json.clj:30-41,87-91`):
    running byte total over a deterministic order, bucketed by budget.

    Window-based: at cluster scale the encode pipeline does this per
    partition inside ``mapInArrow`` instead (no global sort); this expression
    is the SQL-checkable equivalent used for parity tests.
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return F.floor((F.sum(byte_col).over(w) - 1) / F.lit(budget)).cast("long")
