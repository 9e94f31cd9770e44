"""Write-path query: partitioned-table scan with partition pruning (S5/S7/
S12 demonstrated through the driver contract).

``partition_pruned_scan`` materializes a date-partitioned copy of ``events``
once per scale factor (idempotent, under the repo-local ``.scratch/``
directory), then aggregates one day through the partition filter — the plan
touches exactly one partition directory (asserted via explain in
tests/test_io.py; reference semantics: PARTITIONED BY (date) +
literal-date scans, init_iceberg_tables.py:46 / bronze_to_silver.py:39-43).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import register, sql_dsum, t
from bakery_big_data_spark.sources.sinks import write_partitioned

_SCRATCH = "/root/repo/.scratch/partitioned"


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events partitioned by event_date (once per sf)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"events_by_date_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = t(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_partitioned(ev, path, ["event_date"])
    return path


@register(
    "partition_pruned_scan",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'total_value')}
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05'
    GROUP BY event_type
    """,
    doc="S7 partition-predicate pushdown on a real PARTITIONED BY "
        "(event_date) layout: the literal date predicate becomes a "
        "PartitionFilter — one directory scanned regardless of table size "
        "(the property that bounds every batch-ETL scan at 100 TB)",
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(F.col("event_date") == F.lit("2024-01-05").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
