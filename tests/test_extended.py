"""Quantitative bars for the sketch query and the compaction maintenance op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bakery_big_data_spark.plans import REGISTRY
from bakery_big_data_spark.sources.sinks import compact_parquet_dir
from bakery_big_data_spark.sources.tables import load_table


def test_hll_sketch_error_bound(spark, sf01_dir):
    """The merged-sketch estimate must sit within 5% of the exact distinct
    count (default lgConfigK=12 gives ~1.6% standard error — 5% is >3σ).
    The query now carries the bound as its own column (the oracle states
    it TRUE), so the invariant is asserted on the emitted row."""
    row = (
        REGISTRY["sketch_incremental_distinct"]
        .build(spark, sf01_dir)
        .collect()[0]
    )
    assert row["exact_distinct_users"] > 0
    assert row["within_bound"] is True


def test_hll_daily_sketches_merge_like_raw(spark, sf01_dir):
    """Associativity: merging per-day sketches equals sketching the raw rows
    directly — the property that makes persisted day-level sketches a valid
    substitute for raw rescans at any date-range granularity."""
    ev = load_table(spark, sf01_dir, "events")
    via_days = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]["est"]
    )
    assert via_days == direct


def test_compact_parquet_dir(spark, sf_dir, tmp_path):
    """Compaction shrinks a fragmented table to the computed file count and
    preserves the data exactly."""
    target = str(tmp_path / "fragmented")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ev.repartition(16).write.parquet(target)  # fragment: 16 small files
    before_rows = spark.read.parquet(target).count()

    n_before, n_after = compact_parquet_dir(
        spark, target, target_file_bytes=1 << 30
    )
    assert n_before == 16
    assert n_after == 1  # everything fits one target-size file
    after = spark.read.parquet(target)
    assert after.count() == before_rows
    assert (
        after.agg(F.sum("event_id")).collect()[0][0]
        == ev.agg(F.sum("event_id")).collect()[0][0]
    )
    assert not os.path.exists(target + "._compact_tmp")
    assert not os.path.exists(target + "._compact_old")
