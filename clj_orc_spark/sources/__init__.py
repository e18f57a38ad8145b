"""Sources: ORC reader + reference stream-protocol parity shims (S1–S5, J1–J5),
plus the token-table loader (parquet paths / Iceberg identifiers)."""

from .table import read_token_table, validate_token_schema  # noqa: F401
from .orc import (  # noqa: F401
    apply_hadoop_conf,
    configure,
    json_stream,
    read_orc,
    read_stream,
)
