"""Scalar parity functions (reference type-coercion semantics as Spark
expressions).  A real ``__init__.py`` is required — zipimport (the
``--py-files`` deployment artifact) cannot import namespace packages."""

from .parity import (  # noqa: F401
    byte_budget_chunk_id,
    date_to_string,
    json_record,
    nan_to_null,
    timestamp_to_string,
    utf8_byte_count,
)
