"""Parquet table sources for the driver-provided TPC-H-ish test data.

Mirrors the reference's batch scan surface (SURVEY.md §2.1 S4–S7): explicit
schemas come from the parquet footers; filters/projections applied by callers
reach the scan via Catalyst pushdown (verify with ``df.explain`` →
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Canonicalize timestamp columns to TIMESTAMP (LTZ).

    The driver's parquet has shipped both TIMESTAMP(NANOS) (read as long via
    the ``nanosAsLong`` session conf) and plain TIMESTAMP(MICROS) without the
    isAdjustedToUTC flag — which Spark 4 infers as TIMESTAMP_NTZ.  NTZ breaks
    ``unix_micros``/``to_json timestampFormat`` downstream, so we cast to LTZ
    here.  Sessions run UTC (session.tune), and DuckDB's naive timestamps are
    compared in UTC too, so the cast is value-preserving for the oracle.
    """
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Columnar parquet read; never caches or collects.

    ``events.parquet`` has carried TIMESTAMP(NANOS), which vanilla Spark
    rejects (PARQUET_TYPE_ILLEGAL).  Session conf ``nanosAsLong``
    (session.RUNTIME_CONF, applied by tune()) reads nanos as long; here we
    truncate to microsecond timestamps — exactly what DuckDB does natively,
    so oracle comparisons agree.  All timestamp columns are normalized to
    LTZ (see _normalize_timestamps).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TPCH_TABLES}
