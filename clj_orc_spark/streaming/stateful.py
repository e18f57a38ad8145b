"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no event-time state at all (SURVEY.md §2.3 — its
"streaming" is chunked iteration with backpressure).  This module adds the
Spark-native capability its users would reach for next: per-key running
aggregates maintained across micro-batches with explicit state, the pattern
for sessionization / dedup-windows / rate tracking at 100 TB (state lives in
the state store, partitioned by key — nothing accumulates on the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "event_type string, running_cnt long, running_sum double"
STATE_DDL = "cnt long, total double"


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (cnt, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "running_cnt": [cnt], "running_sum": [round(total, 3)]}
    )


def running_event_totals(events_stream):
    """Per-event-type running count/sum maintained in keyed state."""
    return (
        events_stream.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_running_totals(spark, events_dir: str, sink_table: str = "running_totals",
                          max_files_per_trigger: int = 1):
    """File-stream harness: one micro-batch per file so state genuinely
    carries across batches; memory sink keeps every update row."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        running_event_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .trigger(availableNow=True)
        .start()
    )
