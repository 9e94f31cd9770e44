"""Stateful streaming test: running per-user totals accumulate across
micro-batches AND across restarts (state store + checkpoint)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from bakery_big_data_spark.sources.tables import load_table
from bakery_big_data_spark.streaming.ingest import (
    JSON_OPTIONS,
    read_json_stream,
)
from bakery_big_data_spark.streaming.stateful import running_user_totals

SCRATCH = "/root/repo/.scratch/test_stateful"


def _write_json(spark, sf_dir, path, lo, hi):
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= lo) & (F.col("event_id") < hi)
    )
    ev.select(
        F.to_json(F.struct(*ev.columns), JSON_OPTIONS).alias("value")
    ).coalesce(1).write.mode("append").text(path)


def test_state_accumulates_across_restarts(spark, sf_dir):
    os.makedirs(SCRATCH, exist_ok=True)
    base = tempfile.mkdtemp(dir=SCRATCH)
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"

    def run_once():
        stream = running_user_totals(read_json_stream(spark, src))
        q = (
            stream.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, bid: df.withColumn("batch_id", F.lit(bid))
                .write.mode("append")
                .parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_json(spark, sf_dir, src, 0, 400)
    run_once()
    _write_json(spark, sf_dir, src, 400, 1000)
    run_once()  # restart: state must resume from the checkpointed store

    got = spark.read.parquet(out)
    # last emission per user = totals over BOTH batches
    latest = got.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
        ),
    ).filter(F.col("rn") == 1)
    batch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    l = {(r.user_id, r.n_events) for r in latest.select("user_id", "n_events").collect()}
    b = {(r.user_id, r.n_events) for r in batch.collect()}
    assert l == b
