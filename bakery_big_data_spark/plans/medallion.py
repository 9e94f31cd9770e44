"""Mutation-layer queries: MERGE dedup, recency upsert, UPDATE, SCD2, and
late-arrival reconciliation — SURVEY.md §2.1 S10/S11, §2.3 J4, §2.9 T6/T7.

Each query stages a deterministic "target table state" and "incoming batch"
from the driver's parquet tables, applies a pure mutation operator from
:mod:`bakery_big_data_spark.operators.mutation`, and returns the
post-mutation state — which the DuckDB oracle reproduces with set SQL, so the
driver hash-checks full MERGE/SCD2 semantics, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.mutation import (
    merge_upsert_when_newer,
    scd2_apply,
    update_where,
)
from bakery_big_data_spark.plans.base import register, t

_OUT_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@register(
    "merge_full_upsert",
    """
    WITH tgt AS (
      SELECT event_id, value AS silver_value, ts AS etl_ts, 0 AS src
      FROM events WHERE event_id <= 8000
    ), batch AS (
      SELECT event_id, value * 2 AS silver_value,
             CASE WHEN event_id % 2 = 0 THEN ts + INTERVAL 1 HOUR
                  ELSE ts - INTERVAL 1 HOUR END AS etl_ts,
             1 AS src
      FROM events WHERE event_id >= 4000
    ), srcb AS (SELECT * FROM batch UNION ALL SELECT * FROM batch),
    u AS (SELECT * FROM tgt UNION ALL SELECT * FROM srcb)
    SELECT event_id, silver_value, etl_ts
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                       ORDER BY etl_ts DESC, src ASC) AS rn
          FROM u)
    WHERE rn = 1
    """,
    doc="S10 full MERGE in one statement: WHEN MATCHED AND s.etl_timestamp > "
        "t.etl_timestamp THEN UPDATE, WHEN NOT MATCHED THEN INSERT, with the "
        "source delivered TWICE (at-least-once duplicate delivery — the "
        "dedup-merge scenario of bronze_to_silver.py:78-83 composed with the "
        "recency upsert of :151-157).  Even source keys are newer (win), odd "
        "are older (target kept), keys >8000 insert exactly once despite the "
        "double delivery.  Implemented as union + per-key lexicographic "
        "max(struct) — map-side combinable, no window sort",
)
def merge_full_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    target = ev.filter(F.col("event_id") <= 8000).select(
        "event_id",
        F.col("value").alias("silver_value"),
        F.col("ts").alias("etl_ts"),
    )
    batch = ev.filter(F.col("event_id") >= 4000).select(
        "event_id",
        (F.col("value") * 2).alias("silver_value"),
        F.when(
            F.col("event_id") % 2 == 0, F.col("ts") + F.expr("INTERVAL 1 HOUR")
        )
        .otherwise(F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .alias("etl_ts"),
    )
    source = batch.unionAll(batch)  # at-least-once duplicate delivery
    return merge_upsert_when_newer(target, source, ["event_id"], "etl_ts")


@register(
    "update_status_flip",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1997-01-01'
                THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1997-01-01'
                THEN 'RECONCILED' ELSE o_orderpriority END AS o_orderpriority
    FROM orders
    """,
    doc="S11 UPDATE … SET … WHERE — processing-status flip "
        "(reference bronze_to_silver.py:85-90); map-only when/otherwise "
        "rewrite, no shuffle",
)
def update_status_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    flipped = update_where(
        o,
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")),
        {"o_orderstatus": F.lit("P"), "o_orderpriority": F.lit("RECONCILED")},
    )
    return flipped.select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "scd2_versioning",
    """
    WITH cur AS (
      SELECT CAST(c_custkey * 10 AS BIGINT) AS surrogate_key, c_custkey,
             c_mktsegment AS segment, c_acctbal AS acctbal
      FROM customer WHERE c_custkey <= 1200
    ), stg AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'SEGMENT-NEW' ELSE c_mktsegment END AS segment,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal * 1.1
                  WHEN c_custkey % 11 = 0 THEN c_acctbal * 1.02
                  ELSE c_acctbal END AS acctbal
      FROM customer WHERE c_custkey <= 1400
    ), chg AS (
      SELECT s.* FROM stg s
      LEFT JOIN cur c USING (c_custkey)
      WHERE c.c_custkey IS NULL
         OR s.segment <> c.segment
         OR abs(s.acctbal - c.acctbal) / NULLIF(abs(c.acctbal), 0) > 0.05
    )
    SELECT c.surrogate_key, c.c_custkey, c.segment, c.acctbal,
           DATE '2023-01-01' AS start_date,
           CASE WHEN ch.c_custkey IS NOT NULL THEN DATE '2024-06-01' END AS end_date,
           ch.c_custkey IS NULL AS is_current
    FROM cur c LEFT JOIN chg ch USING (c_custkey)
    UNION ALL
    SELECT CAST((SELECT COALESCE(MAX(surrogate_key), 0) FROM cur)
                + ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT),
           c_custkey, segment, acctbal,
           DATE '2024-06-01', NULL, TRUE
    FROM chg
    """,
    doc="J4+S11 SCD Type 2, full semantics in one pass (reference "
        "silver_to_gold.py:130-165 dim_store + :205-231 dim_product_pricing): "
        "new business keys insert, segment changes re-version, and balance "
        "drift re-versions ONLY above the relative 5% threshold (the ~2% "
        "ticks on every 11th key must not open versions, the 10% moves on "
        "every 7th must).  Open versions close (end_date + flag), history "
        "passes through, and the surrogate-key base is the lazy in-plan "
        "COALESCE(MAX(key),0) — no driver scalar read; keys from the "
        "range-partitioned surrogate-key operator, not a global window",
)
def scd2_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    current = cust.filter(F.col("c_custkey") <= 1200).select(
        (F.col("c_custkey") * 10).cast("bigint").alias("surrogate_key"),
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("2023-01-01").cast("date").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.lit(True).alias("is_current"),
    )
    staged = cust.filter(F.col("c_custkey") <= 1400).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, "SEGMENT-NEW")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") * 1.1)
        .when(F.col("c_custkey") % 11 == 0, F.col("c_acctbal") * 1.02)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
    )
    return scd2_apply(
        current,
        staged,
        business_key="c_custkey",
        tracked=["segment", "acctbal"],
        effective_date="2024-06-01",
        key_base=None,  # lazy in-plan MAX(surrogate_key) — no driver action
        drift_condition=(
            (F.col("segment") != F.col("_cur_segment"))
            | (
                F.abs(F.col("acctbal") - F.col("_cur_acctbal"))
                / F.nullif(F.abs(F.col("_cur_acctbal")), F.lit(0))
                > 0.05
            )
        ),
    )


@register(
    "late_arrival_reconciliation",
    """
    WITH bronze AS (
      SELECT event_id, ts, value,
             event_id % 50 AS late_h,
             make_timestamp(epoch_us(ts) + (event_id % 50) * 3600000000) AS ingestion_ts,
             CASE WHEN event_id % 4 = 0 THEN 'pending' ELSE 'processed' END AS status
      FROM events
    ), silver AS (
      SELECT event_id, value AS silver_value, ts AS etl_ts, 0 AS src
      FROM bronze WHERE status = 'processed'
    ), reproc AS (
      SELECT event_id, value * 1.5 AS silver_value, ingestion_ts AS etl_ts, 1 AS src
      FROM bronze
      WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        AND (status = 'pending'
             OR (status = 'processed' AND late_h > 0
                 AND ingestion_ts >= TIMESTAMP '2024-01-06 00:00:00'))
    ), u AS (SELECT * FROM silver UNION ALL SELECT * FROM reproc)
    SELECT event_id, silver_value, etl_ts
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                       ORDER BY etl_ts DESC, src ASC) AS rn
          FROM u)
    WHERE rn = 1
    """,
    doc="T6/T7/U2 late-arrival reconciliation — reprocess pending ∪ "
        "late-processed rows for a day, then recency-conditioned MERGE into "
        "silver (reference bronze_to_silver.py:101-111,151-157); idempotent "
        "(tests/test_mutation.py proves run-twice = run-once)",
)
def late_arrival_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver, reproc = _late_arrival_frames(spark, sf_dir)
    return merge_upsert_when_newer(silver, reproc, ["event_id"], "etl_ts")


def _late_arrival_frames(spark: SparkSession, sf_dir: str):
    """(existing silver state, reprocessing batch) for the T6 scenario.

    Bronze is simulated from ``events``: each event arrives ``event_id % 50``
    hours after its event time (T7 event/ingestion bifurcation, reference
    generate_inventory_updates.py:78-101); every 4th event is still pending.
    The reprocessing window (reference bronze_to_silver.py:101-111) picks one
    event-date's pending rows plus already-processed rows whose ingestion was
    recent and late.
    """
    ev = t(spark, sf_dir, "events")
    hours_us = (F.col("event_id") % 50) * F.lit(3600000000).cast("bigint")
    bronze = ev.select(
        "event_id",
        "ts",
        "value",
        (F.col("event_id") % 50).alias("late_h"),
        F.timestamp_micros(F.unix_micros("ts") + hours_us).alias("ingestion_ts"),
        F.when(F.col("event_id") % 4 == 0, "pending")
        .otherwise("processed")
        .alias("status"),
    )
    silver = bronze.filter(F.col("status") == "processed").select(
        "event_id",
        F.col("value").alias("silver_value"),
        F.col("ts").alias("etl_ts"),
    )
    reproc = bronze.filter(
        (F.to_date("ts") == F.lit("2024-01-05").cast("date"))
        & (
            (F.col("status") == "pending")
            | (
                (F.col("status") == "processed")
                & (F.col("late_h") > 0)
                & (
                    F.col("ingestion_ts")
                    >= F.lit("2024-01-06 00:00:00").cast("timestamp")
                )
            )
        )
    ).select(
        "event_id",
        (F.col("value") * 1.5).alias("silver_value"),
        F.col("ingestion_ts").alias("etl_ts"),
    )
    return silver, reproc




@register(
    "cdc_apply_changes",
    """
    WITH tgt AS (
      SELECT event_id, value AS silver_value, ts AS etl_ts, 0 AS src
      FROM events WHERE event_id <= 8000
    ), chg AS (
      SELECT event_id,
             CASE WHEN event_id % 4 = 0 THEN 'D'
                  WHEN event_id % 4 IN (1, 2) THEN 'U'
                  ELSE 'I' END AS op,
             value * 3 AS silver_value,
             ts + INTERVAL 1 HOUR AS etl_ts,
             1 AS src
      FROM events WHERE event_id >= 6000
    ), kept AS (
      SELECT * FROM tgt
      WHERE event_id NOT IN (SELECT event_id FROM chg WHERE op = 'D')
    ), u AS (
      SELECT event_id, silver_value, etl_ts, src FROM kept
      UNION ALL
      SELECT event_id, silver_value, etl_ts, src FROM chg WHERE op <> 'D'
    )
    SELECT event_id, silver_value, etl_ts
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                       ORDER BY etl_ts DESC, src ASC) AS rn
          FROM u)
    WHERE rn = 1
    """,
    doc="CDC change-batch application (inserts/updates/deletes in ONE "
        "batch — the general MERGE the reference's Iceberg jobs run, "
        "bronze_to_silver.py:78-90, extended with WHEN MATCHED AND op='D' "
        "THEN DELETE): deletes drop via a broadcast-able anti-join on the "
        "delete-key set, upserts apply through the same recency max-struct "
        "merge as S10 (map-side combinable, no window sort).  One keyed "
        "shuffle over the target; the change batch (small by nature) "
        "broadcasts in both phases",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    target = ev.filter(F.col("event_id") <= 8000).select(
        "event_id",
        F.col("value").alias("silver_value"),
        F.col("ts").alias("etl_ts"),
    )
    changes = ev.filter(F.col("event_id") >= 6000).select(
        "event_id",
        F.when(F.col("event_id") % 4 == 0, "D")
        .when((F.col("event_id") % 4).isin(1, 2), "U")
        .otherwise("I")
        .alias("op"),
        (F.col("value") * 3).alias("silver_value"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("etl_ts"),
    )
    deletes = changes.filter(F.col("op") == "D").select("event_id")
    kept = target.join(deletes, "event_id", "left_anti")
    upserts = changes.filter(F.col("op") != "D").drop("op")
    return merge_upsert_when_newer(kept, upserts, ["event_id"], "etl_ts")
