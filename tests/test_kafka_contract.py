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
