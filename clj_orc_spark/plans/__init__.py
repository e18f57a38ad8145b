"""Plan auditors: pushdown/pruning/codegen assertions over physical plans."""

from .explain import (  # noqa: F401
    assert_columns_pruned,
    assert_filter_pushed,
    executed_codegen_count,
    explain_str,
    pushed_filters,
    read_schema,
    wholestage_codegen_count,
)
