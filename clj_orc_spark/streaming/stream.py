"""Streaming surfaces.

The reference's "streaming" is chunked iteration over a bounded channel with
backpressure (`src/orc/read.clj:75,101-103`, `src/orc/json.clj:48-101`) — a
producer thread pushing numbered chunks to one consumer.  The Spark-native
equivalents:

* :func:`stream_decode` — Structured Streaming over the encoded ``chunks/``
  directory: chunk files land → micro-batch decodes them → token rows flow to
  the sink.  Backpressure = ``maxFilesPerTrigger`` (the ``buf-size`` analog,
  `src/orc/read.clj:16`); ordering = ``chunk_id`` (the ``{:i n}`` payload
  index analog, `src/orc/read.clj:94`).  Chunk atomicity: a chunk's five
  column rows are always written inside one parquet file by the encoder task,
  and the file-source assigns whole files to micro-batches.
* :func:`windowed_event_counts` — event-time tumbling-window aggregation with
  a watermark for late data: the standard streaming-analytics surface the
  reference lacks entirely (SURVEY.md §2.3).
* :func:`stream_encode` — the ingest direction: token-table parquet files
  land → each micro-batch encodes into the SAME chunks+manifest layout the
  batch pipeline writes, so batch ``decode``/``verify``/resume all work on a
  streaming-built store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def _source_log_files(spark, checkpoint: str, batch_id: int) -> list[str]:
    """File paths the FileStreamSource assigned to ``batch_id``, from its
    commit log at ``<checkpoint>/sources/0/<batch_id>`` (header line ``v1``,
    then one JSON object per file).  Empty list → caller falls back to the
    shuffle-mode decode (non-file source, or an unrecognized log format)."""
    import json

    from ..pipeline import fsio

    base = os.path.join(checkpoint, "sources", "0", str(int(batch_id)))
    # every compactInterval-th batch (default 10) the source writes
    # <id>.compact holding ALL entries so far, each tagged with its
    # batchId — without checking it those batches would silently fall
    # back to the shuffle decode
    compact = None
    try:
        if fsio.exists(spark, base):
            text = fsio.read_text(spark, base)
        elif fsio.exists(spark, base + ".compact"):
            text = fsio.read_text(spark, base + ".compact")
            compact = int(batch_id)
        else:
            return []
    except Exception:
        return []
    files = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("v"):
            continue
        try:
            entry = json.loads(line)
            if compact is not None and int(entry.get("batchId", -1)) != compact:
                continue
            files.append(entry["path"])
        except (ValueError, KeyError, TypeError):
            return []  # unknown format: never guess, take the safe path
    return sorted(files)


def stream_decode(
    spark,
    out_dir: str,
    sink_dir: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
    _plan_log: list | None = None,
):
    """Continuously decode encoded chunks as they land; returns the query.

    ``foreachBatch`` reuses the exact batch decode kernel path.  Round 5:
    each micro-batch decodes through the ZERO-SHUFFLE files-mode kernel —
    the batch's file list comes from the file source's own commit log
    (``<checkpoint>/sources/0/<batch_id>``, written by the source when it
    plans the batch — driver-side metadata, no job; ``inputFiles()`` is
    empty inside foreachBatch because the batch DataFrame is an
    ExistingRDD wrapper).  One task per chunk file, same as batch
    ``decode(mode="files")``; the old ``groupBy(chunk_id).applyInArrow``
    reshuffled every payload byte once per micro-batch.  The encoder writes
    a chunk's column rows contiguously into one file and the file source
    assigns whole files to micro-batches, so per-file decode is complete.
    Output is partitioned by ``_batch_id`` and each batch overwrites its own
    partition, so foreachBatch's at-least-once replays are idempotent.
    """
    from ..pipeline import pafs
    from ..pipeline.decode import (
        _physical_map,
        _select_ddl,
        decode_chunk_table,
        make_files_decoder,
        store_schema,
    )

    chunks_dir = os.path.join(out_dir, "chunks")
    static_schema = spark.read.parquet(chunks_dir).schema
    # honor the store's pinned schema descriptor (round 4: stores may hold
    # ANY flat schema, not just the token table)
    schema = store_schema(spark, out_dir)
    ddl = _select_ddl([name for name, _ in schema], schema)
    needed = sorted({
        p for c in (name for name, _ in schema)
        for p in _physical_map(schema)[c]
    })
    # overlap reads only for remote stores (see decode(): local saturated
    # cores lose to the extra reader thread, object stores win)
    decoder = make_files_decoder(None, schema, needed, False,
                                 prefetch="://" in out_dir)

    stream = (
        spark.readStream.schema(static_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunks_dir)
    )

    checkpoint = os.path.join(sink_dir, "_checkpoint")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        import pyarrow as pa

        sess = batch_df.sparkSession
        files = _source_log_files(sess, checkpoint, batch_id)
        if files:
            work = sess.createDataFrame(
                sess.sparkContext.parallelize(
                    [(f, None) for f in files], len(files)
                ),
                "path string, cids string",
            )
            decoded = work.mapInArrow(decoder, ddl)
        else:
            if not batch_df.take(1):
                return
            # file list unavailable (non-file source): shuffle fallback

            def decode_group(tbl: pa.Table) -> pa.Table:
                pafs.clamp_arrow_threads()
                return decode_chunk_table(tbl, None, schema)

            decoded = batch_df.groupBy("chunk_id").applyInArrow(
                decode_group, ddl
            )
        if _plan_log is not None:  # test hook: record the micro-batch plan
            _plan_log.append(
                decoded._jdf.queryExecution().executedPlan().toString()
            )
        # idempotent under foreachBatch's at-least-once replays: each batch
        # owns the _batch_id=N partition and a replay OVERWRITES it instead
        # of appending duplicate rows (the decode-side mirror of
        # stream_encode's batch-scoped part_id namespace)
        (
            decoded.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(sink_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", os.path.join(sink_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_encode(
    spark,
    input_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 8,
    parts_per_batch: int | None = None,
    chunk_bytes: int | None = None,
    available_now: bool = True,
    selection: str = "size",
):
    """Structured-Streaming encode: new token-table files → encoded chunks.

    Each micro-batch salts rows across ``parts_per_batch`` partitions inside
    a batch-scoped part_id namespace (``batch_id * K + xxhash64(doc_id) % K``)
    — deterministic given batch content, so a replayed batch (foreachBatch
    at-least-once) rewrites the SAME partitions via dynamic partition
    overwrite instead of duplicating them: the streaming analog of the batch
    pipeline's per-partition lineage.  Output layout, manifest, decode and
    verify are identical to the batch path.
    """
    import json

    from ..pipeline import fsio
    from ..pipeline.encode import (
        DEFAULT_CHUNK_BYTES,
        OUT_DDL,
        _commit_manifest,
        _write_chunks,
        make_encoder,
    )

    cb = chunk_bytes or DEFAULT_CHUNK_BYTES
    # replay idempotency REQUIRES the same part_id namespace across
    # restarts: a replayed batch salted with a different k would write new
    # partitions instead of overwriting the committed ones.  Pin k in a
    # sidecar on first start, exactly like batch encode pins plan.json.
    meta_path = os.path.join(out_dir, "stream_meta.json")
    if fsio.exists(spark, meta_path):
        pinned = json.loads(fsio.read_text(spark, meta_path))["parts_per_batch"]
        if parts_per_batch is not None and parts_per_batch != pinned:
            raise ValueError(
                f"out_dir was started with parts_per_batch={pinned}; a "
                f"restart must keep it (got {parts_per_batch})"
            )
        k = pinned
    else:
        k = parts_per_batch or spark.sparkContext.defaultParallelism
        fsio.write_text(spark, meta_path, json.dumps({"parts_per_batch": k}))
    chunks_dir = os.path.join(out_dir, "chunks")
    # the landing dir's schema is the token-table contract — never inferred
    # (inference crashes on the EMPTY landing dir a fresh ingest starts with)
    stream = (
        spark.readStream.schema(
            "doc_id string, tokens array<int>, n_tok int, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        work = batch_df.withColumn(
            "part_id",
            (
                F.lit(int(batch_id) * k)
                + F.pmod(F.xxhash64(F.col("doc_id")), F.lit(k))
            ).cast("int"),
        )
        encoded = work.repartition(k, "part_id").mapInArrow(
            make_encoder(cb, selection), OUT_DDL
        )
        _write_chunks(encoded, chunks_dir)
        spark_session = batch_df.sparkSession
        pending = list(range(int(batch_id) * k, int(batch_id) * k + k))
        _commit_manifest(spark_session, out_dir, chunks_dir, pending)

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Event-time tumbling window counts with late-data watermark.

    Works on both a static DataFrame (tests/oracle parity) and a streaming
    one (``spark.readStream``) — same plan, Catalyst handles both.
    """
    # parquet timestamp[us] loads as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 3).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "cnt",
            "value_sum",
        )
    )


def stream_events_from_dir(
    spark, events_dir: str, sink_table: str = "windowed_counts",
    window: str = "1 hour", watermark: str = "2 hours",
):
    """readStream → windowed agg → in-memory sink (demo/test harness)."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window, watermark)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .trigger(availableNow=True)
        .start()
    )
