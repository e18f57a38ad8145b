"""Streaming tests: chunk-stream decode (the reference's channel-consumer
analog) and windowed event aggregation with watermark."""

import os

from pyspark.sql import functions as F

from clj_orc_spark.pipeline import encode, verify_roundtrip
from clj_orc_spark.streaming import stream_decode, stream_events_from_dir


def test_stream_decode_matches_source(spark, token_table_dir, tmp_dir):
    src = os.path.join(token_table_dir, "tokens.parquet")
    out = os.path.join(tmp_dir, "enc")
    encode(spark, src, out, n_partitions=4)

    sink = os.path.join(tmp_dir, "decoded")
    q = stream_decode(spark, out, sink, max_files_per_trigger=2)
    q.awaitTermination(120)

    decoded = spark.read.parquet(sink)
    v = verify_roundtrip(spark.read.parquet(src), decoded)
    assert v["bit_identical"] and v["total"] == 5_000, v


def test_windowed_event_counts(spark, tmp_dir):
    # the file stream source needs a directory of files
    events_dir = os.path.join(tmp_dir, "events")
    os.makedirs(events_dir)
    import shutil

    shutil.copy("/root/testdata/sf0.01/events.parquet",
                os.path.join(events_dir, "events.parquet"))
    q = stream_events_from_dir(spark, events_dir, sink_table="wc_test")
    q.awaitTermination(120)
    streamed = spark.table("wc_test")

    # static-plan equivalence: same agg over a batch read
    from clj_orc_spark.streaming import windowed_event_counts

    static = windowed_event_counts(spark.read.parquet(events_dir))
    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in static.collect()}
    assert s_rows == b_rows and len(s_rows) > 0
