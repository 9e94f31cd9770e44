"""CSV batch source with explicit casts — SURVEY.md §2.1 S4.

Mirrors the reference's CSV ingest (``load_bronze_from_csv.py:21-46``):
header read, everything inferred as string, then **explicit per-column
casts** (no schema inference on typed data), with backtick quoting for
flattened dotted column names (``raw_payload.time_of_day`` etc.,
``load_bronze_from_csv.py:43``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_with_casts(
    spark: SparkSession,
    path: str,
    casts: dict[str, str],
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Read header CSV as strings, then cast each column per ``casts``
    (column → Spark type DDL).  Dotted source names are handled with
    backtick quoting; ``rename`` maps them to clean output names."""
    df = spark.read.option("header", "true").csv(path)
    rename = rename or {}
    cols = []
    for name, typ in casts.items():
        src = F.col(f"`{name}`")
        out = rename.get(name, name)
        cols.append(src.cast(typ).alias(out))
    return df.select(*cols)
