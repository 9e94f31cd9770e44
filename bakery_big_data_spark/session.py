"""SparkSession construction and session-level defaults.

The reference ships its session config in ``processing/config/spark-defaults.conf``
(AQE + coalescePartitions + skewJoin enabled, Kryo serializer) and forces UTC via
``-Duser.timezone=UTC`` (reference makefile:139-140).  We adopt the same
semantics-affecting defaults; infra-only knobs (S3A tuning, Iceberg catalog)
are out of scope for the parquet-backed test harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to *any* session we are handed (the test
#: driver builds its own SparkSession); only semantics-affecting, idempotent.
RUNTIME_CONF = {
    # Deterministic date/timestamp bucketing (reference runs everything UTC).
    "spark.sql.session.timeZone": "UTC",
    # AQE on, as in the reference spark-defaults.conf:17-19.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The driver's events.parquet carries TIMESTAMP(NANOS), which vanilla
    # Spark rejects (PARQUET_TYPE_ILLEGAL); read nanos as long and let the
    # loader truncate to micros (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime defaults to an existing session (idempotent, cheap).

    Query builders call this so results are deterministic regardless of who
    constructed the session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-runtime-settable on this build — leave the session's value.
            pass
    return spark


def get_spark(app_name: str = "bakery-big-data-spark") -> SparkSession:
    """Build (or fetch) a local session sized for the test environment.

    local[$SPARK_GRAFT_CPUS] with a shuffle-partition count matched to the
    core count — at 100 TB scale the same code runs with cluster-appropriate
    ``spark.sql.shuffle.partitions`` (AQE coalescing makes the exact number
    forgiving).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
