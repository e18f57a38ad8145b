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


def test_stateful_running_totals(spark, tmp_dir):
    """applyInPandasWithState carries keyed state across micro-batches:
    with one file per trigger, the final update row per key must equal the
    whole-dataset aggregate."""
    import shutil

    import pyarrow.parquet as pq

    from clj_orc_spark.streaming import stream_running_totals

    # split events into 3 files -> 3 micro-batches
    events_dir = os.path.join(tmp_dir, "ev")
    os.makedirs(events_dir)
    t = pq.read_table("/root/testdata/sf0.01/events.parquet")
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), os.path.join(events_dir, f"p{i}.parquet"))

    q = stream_running_totals(spark, events_dir, sink_table="rt_test")
    q.awaitTermination(180)
    updates = spark.table("rt_test").toPandas()
    # multiple update rows per key (state really crossed batches)
    assert updates.groupby("event_type").size().max() >= 2
    final = updates.groupby("event_type").last()

    from pyspark.sql import functions as F

    expected = {
        r["event_type"]: (r["cnt"], r["vsum"])
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 3).alias("vsum"))
        .collect()
    }
    for et, (cnt, vsum) in expected.items():
        assert final.loc[et, "running_cnt"] == cnt, et
        assert abs(final.loc[et, "running_sum"] - vsum) < 1e-6, et


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


def test_stream_encode_builds_decodable_store(spark, token_table_dir, tmp_dir):
    """Ingest direction: files land → micro-batches encode into the SAME
    chunks+manifest layout; batch decode + bit-identity verify work on the
    streaming-built store."""
    from clj_orc_spark.pipeline import decode
    from clj_orc_spark.streaming import stream_encode

    src = spark.read.parquet(os.path.join(token_table_dir, "tokens.parquet"))
    in_dir = os.path.join(tmp_dir, "landing")
    # three landing files -> three micro-batches at maxFilesPerTrigger=1
    src.repartition(3).write.parquet(in_dir)

    out = os.path.join(tmp_dir, "stream-enc")
    q = stream_encode(spark, in_dir, out, max_files_per_trigger=1,
                      parts_per_batch=2)
    q.awaitTermination(180)

    v = verify_roundtrip(src, decode(spark, out))
    assert v["bit_identical"] and v["total"] == 5_000, v

    # restart with no new files: checkpoint replays nothing, store unchanged
    q2 = stream_encode(spark, in_dir, out, max_files_per_trigger=1,
                       parts_per_batch=2)
    q2.awaitTermination(120)
    v2 = verify_roundtrip(src, decode(spark, out))
    assert v2["bit_identical"] and v2["extra"] == 0, v2
