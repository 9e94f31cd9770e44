"""Unit tests for the parquet-native mutation operators (SURVEY.md §2.1
S10/S11, §2.3 J4, §2.9 T6) on tiny inline frames with golden expectations,
plus the T6 idempotency property the reference never tested."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from bakery_big_data_spark.operators.keys import add_surrogate_key
from bakery_big_data_spark.operators.mutation import (
    delete_where,
    merge_insert_if_absent,
    merge_upsert_when_newer,
    scd2_apply,
    update_where,
)


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_merge_insert_if_absent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    # key 2 matched (ignored), key 3 delivered twice (dedup to one insert)
    source = spark.createDataFrame([(2, "B"), (3, "c"), (3, "c")], ["k", "v"])
    out = merge_insert_if_absent(target, source, ["k"])
    assert rows(out, "k", "v") == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_upsert_when_newer(spark):
    target = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], ["k", "v", "etl"]
    )
    source = spark.createDataFrame(
        [(1, "new", 11), (2, "stale", 20), (3, "ins", 5)], ["k", "v", "etl"]
    )
    out = merge_upsert_when_newer(target, source, ["k"], "etl")
    # k=1 strictly newer → updated; k=2 tie → target wins; k=3 → inserted
    assert rows(out, "k", "v", "etl") == [(1, "new", 11), (2, "keep", 20), (3, "ins", 5)]


def test_update_where(spark):
    df = spark.createDataFrame([(1, "pending"), (2, "done")], ["k", "status"])
    out = update_where(df, F.col("status") == "pending", {"status": F.lit("processed")})
    assert rows(out, "k", "status") == [(1, "processed"), (2, "done")]


def test_update_where_sees_pre_update_row(spark):
    # UPDATE semantics: the condition and all values evaluate against the
    # OLD row, even when the condition references a column being assigned.
    df = spark.createDataFrame([(1, "O", "hi")], ["k", "status", "note"])
    out = update_where(
        df,
        F.col("status") == "O",
        {"status": F.lit("P"), "note": F.lit("flipped")},
    )
    assert rows(out, "k", "status", "note") == [(1, "P", "flipped")]


def test_delete_where(spark):
    df = spark.createDataFrame([(1, "x"), (2, None), (3, "y")], ["k", "v"])
    out = delete_where(df, F.col("v") == "x")  # NULL predicate must not delete
    assert rows(out, "k") == [(2,), (3,)]


def test_scd2_apply(spark):
    current = spark.createDataFrame(
        [
            # closed historical version must pass through untouched
            (1, 10, "old-seg", date(2020, 1, 1), date(2023, 1, 1), False),
            (2, 10, "seg-a", date(2023, 1, 1), None, True),  # will drift
            (3, 20, "seg-b", date(2023, 1, 1), None, True),  # unchanged
        ],
        ["surrogate_key", "bk", "seg", "start_date", "end_date", "is_current"],
    )
    staged = spark.createDataFrame(
        [(10, "seg-a2"), (20, "seg-b"), (30, "seg-new")], ["bk", "seg"]
    )
    out = scd2_apply(
        current, staged, business_key="bk", tracked=["seg"],
        effective_date="2024-06-01", key_base=100,
    )
    got = rows(out, "surrogate_key", "bk", "seg", "start_date", "end_date", "is_current")
    assert got == [
        (1, 10, "old-seg", date(2020, 1, 1), date(2023, 1, 1), False),
        (2, 10, "seg-a", date(2023, 1, 1), date(2024, 6, 1), False),  # closed
        (3, 20, "seg-b", date(2023, 1, 1), None, True),               # untouched
        (101, 10, "seg-a2", date(2024, 6, 1), None, True),            # new version
        (102, 30, "seg-new", date(2024, 6, 1), None, True),           # new key
    ]


def test_scd2_key_base_inferred(spark):
    current = spark.createDataFrame(
        [(7, 1, "a", date(2023, 1, 1), None, True)],
        "surrogate_key LONG, bk LONG, seg STRING, start_date DATE, "
        "end_date DATE, is_current BOOLEAN",
    )
    staged = spark.createDataFrame([(2, "b")], ["bk", "seg"])
    out = scd2_apply(current, staged, "bk", ["seg"], "2024-01-01")
    new = [r for r in out.collect() if r["bk"] == 2]
    assert [r["surrogate_key"] for r in new] == [8]  # max(7)+1


def test_add_surrogate_key_dense_and_ordered(spark):
    n = 1000
    df = (
        spark.range(n)
        .withColumn("k", (F.lit(n) - F.col("id")).cast("bigint"))  # reversed
        .repartition(13)  # scrambled physical layout
        .select("k")
    )
    out = add_surrogate_key(df, ["k"], key_col="sk", base=50, num_partitions=7)
    got = rows(out, "k", "sk")
    assert got == [(k, 50 + k) for k in range(1, n + 1)]


def test_late_arrival_reconciliation_idempotent(spark):
    from bakery_big_data_spark.plans.medallion import _late_arrival_frames

    silver, reproc = _late_arrival_frames(spark, "/root/testdata/sf0.001")
    once = merge_upsert_when_newer(silver, reproc, ["event_id"], "etl_ts")
    twice = merge_upsert_when_newer(once, reproc, ["event_id"], "etl_ts")
    cols = ["event_id", "silver_value", "etl_ts"]
    assert rows(once, *cols) == rows(twice, *cols)
    assert once.count() > silver.count()  # pending rows were inserted
