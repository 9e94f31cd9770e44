"""Kafka-shaped contract tests without a broker (r09 verdict task 8).

The sandbox has neither a Kafka broker nor the spark-sql-kafka connector
jar, so no streaming row can EXECUTE against Kafka (documented in
README + VERDICT "What's missing" #1).  What CAN be pinned mechanically:

1. the option dict `streaming/ingest.py::kafka_reader_options` produces —
   names and value shapes against Spark 4's documented Kafka source
   options (`kafka.bootstrap.servers`, `subscribe`, `startingOffsets`,
   `failOnDataLoss`);
2. that `spark.readStream.format("kafka").options(**opts)` ACCEPTS the
   dict (DataStreamReader option plumbing is engine-side and real), and
   that the failure on `.load()` is exactly the missing-connector error
   [DATA_SOURCE_NOT_FOUND] naming the kafka artifact — i.e. the options
   were never the problem; the only un-exercisable surface is the
   connector jar + broker, which is the one-place documentation the
   verdict asked for.

The file-replay custom DataSource (streaming_ingest_replay) certifies the
identical downstream decode/sink/checkpoint plan.
"""

from __future__ import annotations

import json

import pytest

from bakery_big_data_spark.streaming.ingest import kafka_reader_options


def test_kafka_option_names_and_value_shapes():
    opts = kafka_reader_options("events", "broker1:9092,broker2:9092")
    # Spark 4 Kafka source: exactly one of subscribe / subscribePattern /
    # assign must be present; bootstrap servers are mandatory and
    # comma-separated host:port; startingOffsets is one of the literals
    # or a per-partition JSON map; failOnDataLoss is a boolean string.
    assert set(opts) == {
        "kafka.bootstrap.servers",
        "subscribe",
        "startingOffsets",
        "failOnDataLoss",
    }
    assert all(isinstance(v, str) for v in opts.values())
    for hostport in opts["kafka.bootstrap.servers"].split(","):
        host, port = hostport.rsplit(":", 1)
        assert host and port.isdigit()
    assert opts["subscribe"] == "events"
    so = opts["startingOffsets"]
    assert so in ("latest", "earliest") or isinstance(json.loads(so), dict)
    assert opts["failOnDataLoss"] in ("true", "false")


def test_kafka_reader_accepts_options_fails_only_on_missing_connector(spark):
    """DataStreamReader.options(**kafka_reader_options(...)) must succeed
    (option names/types plumb through Spark's real reader API); .load()
    must fail with DATA_SOURCE_NOT_FOUND naming the kafka artifact — the
    one remaining broker/connector-required surface — NOT with an option
    validation error."""
    reader = spark.readStream.format("kafka").options(
        **kafka_reader_options("events", "localhost:9092")
    )
    with pytest.raises(Exception) as exc_info:
        reader.load()
    msg = str(exc_info.value)
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
    assert "kafka" in msg.lower()


#: Kafka's fixed raw output schema (what .format("kafka").load() yields) —
#: documented by the Spark Kafka integration guide; the contract frames
#: below are built with createDataFrame against it.
KAFKA_RAW_DDL = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset LONG, "
    "timestamp TIMESTAMP, timestampType INT"
)


def _normalized_plan(df) -> str:
    """Analyzed plan with source-relation noise removed: expr ids
    stripped, the leaf relation line dropped, and the value column's
    to-string cast canonicalized (BINARY on Kafka, already-STRING on file
    replay — the one permitted difference)."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    lines = []
    for line in plan.splitlines():
        if "Relation" in line or "LogicalRDD" in line:
            continue  # the source leaf — the only thing allowed to differ
        line = re.sub(r"#\d+L?", "", line)
        line = re.sub(r"cast\(value as string\)", "value", line)
        lines.append(line)
    return "\n".join(lines)


def test_all_three_topic_schemas_decode_to_reference_types(spark):
    """Every reference topic's decode (stream_to_bronze.py:33-45,84-93,
    132-145 + the post-parse casts) is pinned: field names in order, and
    the cast-adjusted types (timestamps, DATE, DECIMAL(10,2) price,
    DECIMAL(8,2) power)."""
    from bakery_big_data_spark.streaming.ingest import (
        TOPIC_SCHEMA_DDL,
        decode_topic,
    )

    expected = {
        "sales-events": [
            ("event_id", "string"), ("event_time", "timestamp"),
            ("ingestion_time", "timestamp"), ("product_id", "int"),
            ("store_id", "int"), ("quantity", "int"),
            ("unit_price", "decimal(10,2)"), ("customer_id", "string"),
            ("date", "date"), ("time_of_day", "string"),
            ("processing_status", "string"),
        ],
        "equipment-metrics": [
            ("metric_id", "string"), ("equipment_id", "int"),
            ("event_time", "timestamp"), ("ingestion_time", "timestamp"),
            ("power_consumption", "decimal(8,2)"),
            ("operational_status", "string"), ("raw_payload", "string"),
            ("processing_status", "string"),
        ],
        "inventory-updates": [
            ("update_id", "string"), ("event_time", "timestamp"),
            ("ingestion_time", "timestamp"), ("product_id", "int"),
            ("store_id", "int"), ("beginning_stock", "int"),
            ("restocked_quantity", "int"), ("sold_quantity", "int"),
            ("waste_quantity", "int"), ("reported_by", "string"),
            ("processing_status", "string"),
            ("late_arrival_hours", "double"),
        ],
    }
    assert set(TOPIC_SCHEMA_DDL) == set(expected)
    for topic, fields in expected.items():
        raw = spark.createDataFrame([], KAFKA_RAW_DDL)
        out = decode_topic(raw, topic)
        got = [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
        assert got == fields, f"{topic}: {got}"


def test_decode_round_trips_real_payloads(spark):
    """The pinned sales decode actually parses a reference-shaped JSON
    value (bytes, as Kafka delivers them) with correct typed values."""
    import json as _json

    from bakery_big_data_spark.streaming.ingest import decode_topic

    payload = {
        "event_id": "e-1", "event_time": "2024-03-01 10:15:30",
        "ingestion_time": "2024-03-01 10:15:31", "product_id": 7,
        "store_id": 3, "quantity": 2, "unit_price": 4.25,
        "customer_id": "c-9", "date": "2024-03-01",
        "time_of_day": "morning", "processing_status": "valid",
    }
    raw = spark.createDataFrame(
        [(None, _json.dumps(payload).encode(), "sales-events", 0, 0, None, 0)],
        KAFKA_RAW_DDL,
    )
    row = decode_topic(raw, "sales-events").collect()[0]
    assert row.event_id == "e-1" and row.product_id == 7
    assert str(row.unit_price) == "4.25" and row.event_time is not None
    assert row.date.isoformat() == "2024-03-01"


def test_kafka_writer_option_shapes():
    from bakery_big_data_spark.streaming.ingest import kafka_writer_options

    opts = kafka_writer_options(
        "sales-events", "broker1:9092,broker2:9092", "/ckpt/sales"
    )
    assert set(opts) == {
        "kafka.bootstrap.servers", "topic", "checkpointLocation",
    }
    assert all(isinstance(v, str) for v in opts.values())
    for hostport in opts["kafka.bootstrap.servers"].split(","):
        host, port = hostport.rsplit(":", 1)
        assert host and port.isdigit()
    assert opts["topic"] == "sales-events"


def test_kafka_writer_accepts_options_fails_only_on_missing_connector(
    spark, tmp_path
):
    from bakery_big_data_spark.streaming.ingest import kafka_writer_options

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("CAST(value AS STRING) AS value")
    )
    writer = stream.writeStream.format("kafka").options(
        **kafka_writer_options("t", "localhost:9092", str(tmp_path / "ck"))
    )
    with pytest.raises(Exception) as exc_info:
        writer.start()
    msg = str(exc_info.value)
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
    assert "kafka" in msg.lower()


def test_replay_decode_plan_equals_kafka_decode_plan_modulo_source(spark):
    """The downstream decode plan is IDENTICAL whether value arrives as
    Kafka's BINARY or file replay's STRING — analyzed plans match once
    the source relation and the value-to-string cast are normalized
    away, which is the precise sense in which the file-replay rows
    certify the Kafka path (r10 verdict task 7)."""
    from bakery_big_data_spark.streaming.ingest import decode_topic

    for topic in ("sales-events", "equipment-metrics", "inventory-updates"):
        kafka_shaped = spark.createDataFrame([], KAFKA_RAW_DDL)
        replay_shaped = spark.createDataFrame([], "value STRING")
        pk = _normalized_plan(decode_topic(kafka_shaped, topic))
        pr = _normalized_plan(decode_topic(replay_shaped, topic))
        assert pk == pr, f"{topic} decode plans diverge:\n{pk}\n---\n{pr}"


def test_topic_trigger_cadences_pinned_and_accepted(spark):
    """The reference's per-topic processing-time cadences
    (stream_to_bronze.py:70-71,117-118,168-170) are pinned AND the real
    DataStreamWriter.trigger accepts each one — the cadence values can't
    drift or go stale as unreferenced constants."""
    from bakery_big_data_spark.streaming.ingest import (
        TOPIC_TRIGGER,
        topic_trigger,
    )

    assert TOPIC_TRIGGER == {
        "sales-events": "30 seconds",
        "equipment-metrics": "30 seconds",
        "inventory-updates": "60 seconds",
    }
    stream = spark.readStream.format("rate").load()
    for topic in TOPIC_TRIGGER:
        # trigger() parses/validates the interval eagerly
        stream.writeStream.trigger(**topic_trigger(topic))


def _streaming_raw(spark, kafka_shaped: bool):
    """A genuinely STREAMING frame (isStreaming=True) shaped like the
    Kafka source (full KAFKA_RAW_DDL column set, BINARY value) or like
    file replay (bare STRING value), built on the built-in rate source so
    no broker/connector is needed."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    if kafka_shaped:
        return rate.selectExpr(
            "CAST(NULL AS BINARY) AS key",
            "CAST(CAST(value AS STRING) AS BINARY) AS value",
            "'t' AS topic",
            "CAST(0 AS INT) AS partition",
            "value AS offset",
            "timestamp",
            "CAST(0 AS INT) AS timestampType",
        )
    return rate.selectExpr("CAST(value AS STRING) AS value")


def test_streaming_decode_plan_parity_includes_watermark(spark):
    """r11 ADVICE: the batch-frame plan-parity test skips decode_topic's
    `raw.isStreaming` watermark branch on BOTH sides, so the asserted
    equality never covered the inventory 48 h watermark.  This variant
    feeds STREAMING frames: (1) the inventory topic's decoded plan must
    carry an EventTimeWatermark node with the pinned 48-hour delay on
    event_time, (2) kafka-shaped vs replay-shaped STREAMING plans must
    still match modulo source — i.e. file replay adds the SAME watermark
    a real Kafka read would, (3) non-inventory topics add none."""
    from bakery_big_data_spark.streaming.ingest import decode_topic

    def norm(df) -> str:
        # decode_topic's own deepest node is the from_json Project;
        # everything below it (the rate-source shaping projection + the
        # StreamingRelation leaf) is the source side this test permits
        # to differ — truncate there.
        import re

        # EventTimeWatermark prints a per-plan random node UUID
        plan = re.sub(
            r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b",
            "<uuid>",
            _normalized_plan(df),
        )
        lines = plan.splitlines()
        cut = max(i for i, line in enumerate(lines) if "from_json" in line)
        return "\n".join(lines[: cut + 1])

    for topic in ("sales-events", "equipment-metrics", "inventory-updates"):
        pk = norm(decode_topic(_streaming_raw(spark, True), topic))
        pr = norm(decode_topic(_streaming_raw(spark, False), topic))
        assert pk == pr, f"{topic} streaming decode plans diverge:\n{pk}\n---\n{pr}"
        has_wm = "EventTimeWatermark" in pk
        if topic == "inventory-updates":
            assert has_wm, f"missing watermark node:\n{pk}"
            wm_line = next(
                line for line in pk.splitlines() if "EventTimeWatermark" in line
            )
            assert "event_time" in wm_line
            assert "2 days" in wm_line or "48 hours" in wm_line, wm_line
        else:
            assert not has_wm, f"{topic} unexpectedly watermarked:\n{pk}"
