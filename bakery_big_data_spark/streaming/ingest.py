"""Structured Streaming ingest — SURVEY.md §2.1 S1–S3, §2.9 T1–T5.

The reference's streaming layer (``stream_to_bronze.py``) is Kafka JSON →
parse/cast → Iceberg append with processing-time triggers, per-query
checkpoints, and stop-all-on-failure supervision.  Re-expressed here with
the same plan shapes:

- **source**: file JSON-lines stream (same unbounded-relation surface as
  Kafka; :func:`kafka_reader_options` documents the drop-in Kafka config,
  untestable in this environment — no broker);
- **decode**: ``from_json`` with an explicit ``StructType`` + casts
  (``stream_to_bronze.py:58-64``) — no schema inference on the stream;
- **sink**: ``foreachBatch`` → the *batch* append sink
  (sources/sinks.py), so batch tests cover the streaming write path too
  (SURVEY.md §7.3 hard-part (d)); checkpointed, append-mode,
  ``availableNow`` trigger for deterministic test runs, processing-time
  trigger for production cadence (``stream_to_bronze.py:71``);
- **watermark**: declared late-arrival bound (T1) — the real late-data
  reconciliation is the batch MERGE (T6, operators/mutation.py), exactly as
  in the reference;
- **supervision**: start-many / await-any / stop-all (T5,
  ``stream_to_bronze.py:178-219``).

100 TB note: file/Kafka sources scale by input partition count; the sink
commits each micro-batch to its own ``batch_id=N`` parquet directory with
overwrite, so checkpoint-replayed batches rewrite rather than double-append
— restarts are exactly-once per batch id, not merely at-least-once.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: Event-stream schema (explicit, never inferred — S2).
EVENT_SCHEMA_DDL = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)

#: JSON codec options — microsecond timestamps (Spark's default format
#: truncates to milliseconds, silently losing event-time precision).
JSON_OPTIONS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def kafka_reader_options(topic: str, brokers: str) -> dict[str, str]:
    """S1 Kafka source configuration (reference stream_to_bronze.py:48-55).

    Returned as options for ``spark.readStream.format('kafka')``; requires
    the kafka connector package + a broker, neither present here — the file
    stream below exercises the identical downstream plan.
    """
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }


#: The reference's three Kafka topics, with the exact from_json schemas its
#: bronze ingest declares (times arrive as STRINGS and are cast after the
#: parse, per the reference): sales-events stream_to_bronze.py:33-45,
#: equipment-metrics stream_to_bronze.py:84-93, inventory-updates
#: stream_to_bronze.py:132-145.
TOPIC_SCHEMA_DDL: dict[str, str] = {
    "sales-events": (
        "event_id STRING, event_time STRING, ingestion_time STRING, "
        "product_id INT, store_id INT, quantity INT, unit_price DOUBLE, "
        "customer_id STRING, date STRING, time_of_day STRING, "
        "processing_status STRING"
    ),
    "equipment-metrics": (
        "metric_id STRING, equipment_id INT, event_time STRING, "
        "ingestion_time STRING, power_consumption DOUBLE, "
        "operational_status STRING, raw_payload STRING, "
        "processing_status STRING"
    ),
    "inventory-updates": (
        "update_id STRING, event_time STRING, ingestion_time STRING, "
        "product_id INT, store_id INT, beginning_stock INT, "
        "restocked_quantity INT, sold_quantity INT, waste_quantity INT, "
        "reported_by STRING, processing_status STRING, "
        "late_arrival_hours DOUBLE"
    ),
}

#: Per-topic late-arrival bound / trigger cadence the reference declares
#: (stream_to_bronze.py:163 — 48 h watermark on inventory only;
#: :70-71,117-118,168-170 — 30 s / 30 s / 60 s processing-time triggers).
TOPIC_WATERMARK: dict[str, str] = {"inventory-updates": "48 hours"}
TOPIC_TRIGGER: dict[str, str] = {
    "sales-events": "30 seconds",
    "equipment-metrics": "30 seconds",
    "inventory-updates": "60 seconds",
}


def topic_trigger(topic: str) -> dict[str, str]:
    """Trigger kwargs for ``DataStreamWriter.trigger(**topic_trigger(t))``
    at the reference's per-topic cadence (stream_to_bronze.py:70-71,
    117-118, 168-170) — pinned by tests/test_kafka_contract.py so the
    cadences cannot drift silently."""
    return {"processingTime": TOPIC_TRIGGER[topic]}


def kafka_writer_options(
    topic: str, brokers: str, checkpoint: str
) -> dict[str, str]:
    """Writer-side Kafka configuration (the produce half of the contract):
    options for ``df.writeStream.format('kafka')`` — ``kafka.``-prefixed
    client config plus the sink topic and checkpoint.  Same
    broker-required caveat as :func:`kafka_reader_options`; pinned by
    tests/test_kafka_contract.py."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def decode_topic(raw: DataFrame, topic: str) -> DataFrame:
    """The reference's full value-decode transform for one of its three
    topics, SOURCE-AGNOSTIC: applies to any frame with a ``value`` column
    (Kafka's BINARY value, a file-replay STRING line, a memory-stream
    test frame) and produces the identical analyzed plan modulo the
    source relation — the property tests/test_kafka_contract.py asserts,
    and the reason swapping file replay for a real broker changes no
    downstream code.

    Per the reference: ``from_json`` with the topic's explicit schema,
    then event/ingestion-time casts; sales adds the date cast and the
    DECIMAL(10,2) price (stream_to_bronze.py:60-64); equipment adds the
    DECIMAL(8,2) power cast and the raw_payload map normalization
    (:108-112); inventory adds the 48 h watermark on streaming inputs
    (:163)."""
    data = raw.select(
        F.from_json(
            F.col("value").cast("string"), TOPIC_SCHEMA_DDL[topic]
        ).alias("data")
    ).select("data.*")
    data = data.withColumn(
        "event_time", F.to_timestamp("event_time")
    ).withColumn("ingestion_time", F.to_timestamp("ingestion_time"))
    if topic == "sales-events":
        data = data.withColumn("date", F.to_date("date")).withColumn(
            "unit_price", F.col("unit_price").cast("decimal(10,2)")
        )
    elif topic == "equipment-metrics":
        data = data.withColumn(
            "power_consumption",
            F.col("power_consumption").cast("decimal(8,2)"),
        ).withColumn(
            "raw_payload",
            F.to_json(
                F.from_json(F.col("raw_payload"), "map<string,string>")
            ),
        )
    wm = TOPIC_WATERMARK.get(topic)
    if wm is not None and raw.isStreaming:
        data = data.withWatermark("event_time", wm)
    return data


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema_ddl: str = EVENT_SCHEMA_DDL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2: file JSON-lines stream decoded with an explicit schema.

    Reads each line as a raw string and applies ``from_json`` — the same
    decode the Kafka value path uses (``stream_to_bronze.py:58-60``), so
    swapping the source for Kafka changes no downstream code.
    """
    reader = (
        spark.readStream.format("text")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    parsed = raw.select(
        F.from_json(F.col("value"), schema_ddl, JSON_OPTIONS).alias("data")
    ).select("data.*")
    return parsed


def read_json_stream_with_raw(
    spark: SparkSession,
    path: str,
    schema_ddl: str = EVENT_SCHEMA_DDL,
) -> DataFrame:
    """S1/S2 decode that keeps the raw line alongside the parsed struct —
    the input shape the dead-letter routing sink needs.

    PERMISSIVE ``from_json`` yields an all-NULL-fields struct for garbage
    (not a NULL struct), so decode failure is marked explicitly via
    ``columnNameOfCorruptRecord``: ``data._corrupt_record`` is non-NULL
    exactly when the line failed to parse, and ``_raw`` is what lands in
    the DLQ for replay after a schema fix."""
    raw = spark.readStream.format("text").load(path)
    opts = {**JSON_OPTIONS, "columnNameOfCorruptRecord": "_corrupt_record"}
    return raw.select(
        F.col("value").alias("_raw"),
        F.from_json(
            F.col("value"), schema_ddl + ", _corrupt_record STRING", opts
        ).alias("data"),
    )


def start_dlq_sink(
    parsed: DataFrame,
    out_path: str,
    dlq_path: str,
    checkpoint: str,
    available_now: bool = True,
    query_name: str = "ingest_dlq",
) -> StreamingQuery:
    """S3 append sink with dead-letter routing (the robustness layer the
    reference's Kafka ingest needs in production: malformed messages must
    not poison the stream or be silently dropped).

    Each micro-batch splits on decode success: rows whose ``from_json``
    struct is non-NULL land in the table, the raw text of failed rows lands
    in ``dlq_path`` for inspection/replay.  Both writes are per-batch-id
    overwrites, so checkpoint-replayed batches stay exactly-once for table
    AND dead-letter queue.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            ok = batch_df.filter(F.col("data._corrupt_record").isNull())
            bad = batch_df.filter(F.col("data._corrupt_record").isNotNull())
            ok.select("data.*").drop("_corrupt_record").write.mode(
                "overwrite"
            ).parquet(
                os.path.join(out_path, f"batch_id={batch_id}")
            )
            bad.select(F.col("_raw").alias("raw_line")).write.mode(
                "overwrite"
            ).parquet(os.path.join(dlq_path, f"batch_id={batch_id}"))
        finally:
            batch_df.unpersist()

    writer = (
        parsed.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_append_sink(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
    query_name: str = "ingest",
) -> StreamingQuery:
    """S3: checkpointed append sink via foreachBatch → per-batch parquet dir.

    ``availableNow`` drains all pending input then stops (testable,
    deterministic); ``processing_time`` gives the reference's micro-batch
    cadence (30 s / 60 s triggers, stream_to_bronze.py:71,119,170).

    The sink is **idempotent per batch id**: each micro-batch overwrites its
    own ``batch_id=N`` directory, so a retry after a crash between the data
    commit and the checkpoint offset commit rewrites the same directory
    instead of double-appending — exactly-once table contents, not just
    at-least-once delivery.  Readers see ``batch_id`` as an extra partition
    column under ``out_path`` (project it away or use it as lineage).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    writer = (
        df.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_merge_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    recency_col: str,
    available_now: bool = True,
    query_name: str = "merge_ingest",
) -> StreamingQuery:
    """S3/T6 streaming MERGE sink: each micro-batch upserts into a parquet
    state table through the same recency-conditioned merge the batch layer
    uses (operators/mutation.py) — the reference's streaming→silver MERGE
    path (``bronze_to_silver.py:78-90`` run per micro-batch).

    The merged state is rewritten atomically (stage + rename), so readers
    never see a half-merged table; duplicate or replayed batches converge
    to the same state because the merge itself is idempotent on
    (key, recency).
    """
    import shutil

    from bakery_big_data_spark.operators.mutation import merge_upsert_when_newer

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(table_path, "_SUCCESS")):
            target = spark.read.parquet(table_path)
            merged = merge_upsert_when_newer(target, batch_df, keys, recency_col)
        else:
            merged = merge_upsert_when_newer(
                batch_df.limit(0), batch_df, keys, recency_col
            )
        staged = table_path.rstrip("/") + "._merge_tmp"
        shutil.rmtree(staged, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staged)
        old = table_path.rstrip("/") + "._merge_old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(staged, table_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        df.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    watermark_delay: str = "10 minutes",
    window_size: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """T1: watermarked tumbling- (or, with ``slide``, HOPPING-) window
    aggregation.

    In append mode a window emits only once the watermark
    (max event time − delay) passes its end — late rows beyond the bound
    are dropped instead of reopening state.  (The reference declares the
    watermark on its inventory stream, stream_to_bronze.py:157-163, with
    the 48 h late-data bound; batch reconciliation handles the rest.)
    With ``slide`` < ``window_size`` each row pre-expands into its
    ceil(window/slide) member windows before the stateful aggregation —
    state size stays O(open windows × keys), the same append/expiry
    semantics per window.
    """
    win = (
        F.window("ts", window_size)
        if slide is None
        else F.window("ts", window_size, slide)
    )
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-id dedup — ``dropDuplicatesWithinWatermark``
    keyed on event_id.

    NOT plain ``dropDuplicates(["event_id"])``: that variant only evicts
    state when the event-time column is part of the dedup key, so keyed on
    id alone its state grows forever on an unbounded stream.  The
    WithinWatermark form retains each seen key exactly until the watermark
    passes its event time + delay — bounded state at 100 TB/day.  Duplicate
    arrivals older than the horizon are handled by the batch reconciliation
    layer (T6) — the streaming and batch dedup bounds compose exactly like
    the reference's 48 h design (``stream_to_bronze.py:157-163`` +
    ``bronze_to_silver.py:101-111``).  Emission is immediate (row-level
    dedup holds nothing back); only state cleanup rides the watermark.
    """
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: enrich each micro-batch against a batch dimension
    (broadcast per micro-batch; the dim is re-resolved every batch, so slow
    dim updates are picked up without restarting the query)."""
    from pyspark.sql import functions as _F

    return stream.join(_F.broadcast(dim), key, "left")


def supervise(
    queries: list[StreamingQuery],
    on_error: Callable[[Exception], None] | None = None,
) -> None:
    """T5 multi-query supervision: await each query; on any failure stop all
    (reference stream_to_bronze.py:178-219 stop-all-on-error loop)."""
    try:
        for q in queries:
            q.awaitTermination()
    except Exception as exc:  # stop siblings, then surface
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass
        if on_error is not None:
            on_error(exc)
        raise


def session_window_counts(
    events: DataFrame,
    watermark_delay: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Stateful streaming SESSION windows (T1 + merging window state):
    per-user gap-based sessions maintained by the streaming state store —
    sessions grow/merge as events arrive and emit in append mode only when
    the watermark (max event time − delay) passes the session's end
    (last event + gap).  The stateful counterpart of the batch
    sessionize_events / session_window_agg operators; SURVEY §2.9 lists
    session windows as 'not present' in the reference."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    attribution_window: str = "2 hours",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER interval join (attribution shape): each right
    event joins left events of the same user whose timestamp precedes it
    by at most ``attribution_window``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store can evict left rows once the right
    watermark passes ``l.ts + window`` (and vice versa) — without the
    interval bound, stream-stream join state grows forever.  Inner-join
    matches emit as soon as both rows have arrived; the watermark governs
    state cleanup only, so a full ``availableNow`` drain lands exactly the
    batch join's result."""
    l, r = left.alias("l"), right.alias("r")
    lw = l.withWatermark("ts", watermark_delay)
    rw = r.withWatermark("ts", watermark_delay)
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return lw.join(rw, cond, "inner").select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("src_event_id"),
        F.col("l.event_type").alias("src_type"),
        F.col("l.ts").alias("src_ts"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("r.ts").alias("purchase_ts"),
    )


def start_snapshot_rollup_sink(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    available_now: bool = True,
    query_name: str = "gold_rollup",
) -> StreamingQuery:
    """Streaming incremental GOLD maintenance with version history: each
    micro-batch folds its per-key deltas (count + decimal-exact value sum)
    into the running rollup and commits the result as a NEW snapshot
    version (sources/snapshots.py manifest — readers always see a complete
    version, and every historical state stays time-travelable).

    The delta fold touches only the keys present in the batch — the
    incremental-view-maintenance contract: per-batch work is O(batch),
    never O(accumulated table).  Exactly-once: the applied batch_id is
    committed in the SAME atomic manifest swap as the data
    (``write_snapshot(meta=...)``), so a batch replayed after a crash
    between data commit and checkpoint-offset commit is detected
    (``last_commit_meta``) and skipped instead of double-counted.
    """
    from pyspark.sql import functions as F

    from bakery_big_data_spark.sources.snapshots import (
        last_commit_meta,
        read_snapshot,
        table_exists,
        write_snapshot,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = last_commit_meta(table_path)
        if applied is not None and applied.get("batch_id", -1) >= batch_id:
            return  # replayed batch already inside the current version
        delta = batch_df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("_vsum"),
        )
        # Branch on explicit table existence, never a bare except: a
        # transient/corrupt-manifest read error must fail the batch (the
        # checkpoint retries) — substituting an empty frame would commit a
        # delta-only table as the new current version, silently discarding
        # the accumulated rollup.
        if table_exists(table_path):
            current = read_snapshot(spark, table_path).select(
                key_col, "n_events", F.col("value_sum").cast("decimal(30,6)").alias("_vsum")
            )
        else:
            current = delta.limit(0)
        merged = (
            current.unionByName(delta)
            .groupBy(key_col)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_vsum").cast("double").alias("value_sum"),
            )
        )
        write_snapshot(merged, table_path, meta={"batch_id": batch_id})

    writer = (
        df.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_left_join_streams(
    left: DataFrame,
    right: DataFrame,
    attribution_window: str = "2 hours",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the hard semantic corner:
    matched pairs emit as both sides arrive, but an UNMATCHED left row can
    only emit once the state store is certain no match can still come,
    i.e. when BOTH watermarks pass its interval end.  Without that
    discipline an outer join would emit false NULLs for matches that are
    merely late.  Downstream must therefore drive the watermark forward
    (e.g. a sentinel batch in replays) before expecting the NULL rows."""
    l, r = left.alias("l"), right.alias("r")
    lw = l.withWatermark("ts", watermark_delay)
    rw = r.withWatermark("ts", watermark_delay)
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return lw.join(rw, cond, "left_outer").select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("src_event_id"),
        F.col("l.ts").alias("src_ts"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("r.ts").alias("purchase_ts"),
    )


def interval_full_join_streams(
    left: DataFrame,
    right: DataFrame,
    attribution_window: str = "2 hours",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both outer corners at
    once: unmatched LEFT rows (no conversion inside the window) and
    unmatched RIGHT rows (a conversion with no preceding touchpoint) each
    emit exactly once, when both watermarks pass the row's interval end.
    The range condition bounds state on BOTH sides (right rows can only
    match left rows at most ``attribution_window`` older), which is what
    lets Spark expire either side's state; the output key coalesces the
    two sides' user ids since either may be NULL."""
    l, r = left.alias("l"), right.alias("r")
    lw = l.withWatermark("ts", watermark_delay)
    rw = r.withWatermark("ts", watermark_delay)
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return lw.join(rw, cond, "full_outer").select(
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.col("l.event_id").alias("src_event_id"),
        F.col("l.ts").alias("src_ts"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("r.ts").alias("purchase_ts"),
    )
