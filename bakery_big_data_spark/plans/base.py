"""Registry plumbing + cross-engine numeric determinism helpers.

Every query is checked against a DuckDB oracle with an order-insensitive
value hash, so floating-point aggregates must be bit-identical between Spark
and DuckDB.  Double summation is order-dependent; decimal summation is exact.
Convention used by every query in this catalog:

- per-row arithmetic stays DOUBLE (IEEE ops are deterministic per row in
  both engines);
- aggregate sums cast each addend to ``DECIMAL(30,6)`` (identical half-up
  rounding in Spark and DuckDB), sum exactly, then cast the final value to
  DOUBLE — same bits on both sides regardless of partitioning or order;
- averages are exact-sum / count (one double division);
- stddev is computed from exact sums of x and x² rather than the engines'
  (order-sensitive) native implementations.

At 100 TB this costs nothing: decimal partial aggregation is still map-side
combinable and whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.session import tune
from bakery_big_data_spark.sources.tables import load_table

DEC = "decimal(30,6)"


@dataclass(frozen=True)
class Query:
    """One catalog entry: a Spark plan builder plus its DuckDB oracle SQL.

    ``oracle`` is None for genuinely non-SQL-expressible operators (the
    driver then records a weaker rows-only check).
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` builder to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(name=name, build=build, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work downstream of a narrow scan can use the
    whole cluster.

    A small table (one file / one row group) arrives as a single input split,
    so an expensive per-row transform (shingling, hashing, feature extraction)
    would serialize on one core no matter how many are free.  If the scan's
    split count is well below the available parallelism, repartition up to it;
    when the input already has enough splits (any real multi-file / 100 TB
    table), this is a NO-OP — no shuffle is injected at scale, the shuffle
    only materializes exactly when it is trivially cheap (the data fit in one
    split).
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= cores:
        return df.repartition(cores)
    return df


# ---- deterministic aggregate builders (Spark side) ----

def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM: decimal-exact internally, DOUBLE externally."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG = exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def dstd(col: Column | str, alias: str) -> Column:
    """Order-independent sample stddev from exact sums of x and x².

    SQL STDDEV_SAMP semantics for degenerate groups: n < 2 yields NULL —
    an unguarded ``/(n-1)`` raises DIVIDE_BY_ZERO under ANSI the first
    time a regenerated corpus produces a single-row group (caught by the
    adversarial-regeneration suite, round 5)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = F.sum(c.cast(DEC)).cast("double")
    s2 = F.sum((c * c).cast(DEC)).cast("double")
    return F.when(
        n > 1.0, F.sqrt((s2 - s * s / n) / (n - F.lit(1.0)))
    ).alias(alias)


def dtrunc(col: Column, alias: str, scale: int = 2) -> Column:
    """Deterministic cross-engine 'rounding': truncate toward -inf at `scale`.

    Spark's ROUND (BigDecimal, string-based) and DuckDB's ROUND (binary
    multiply) disagree on doubles near representation boundaries;
    floor(x*10^s)/10^s is bit-identical in both engines given identical x.
    """
    m = float(10**scale)
    return (F.floor(col * m) / m).alias(alias)


# ---- matching oracle-SQL snippets (DuckDB side) ----


def sql_dtrunc(expr: str, alias: str, scale: int = 2) -> str:
    m = float(10**scale)
    return f"FLOOR(({expr}) * {m}) / {m} AS {alias}"

def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def sql_dstd(expr: str, alias: str) -> str:
    s = f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
    s2 = f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL(30,6))) AS DOUBLE)"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    # n < 2 -> NULL, mirroring STDDEV_SAMP (DuckDB's float 0/0 would
    # otherwise yield NaN where ANSI Spark raises)
    return (
        f"CASE WHEN {n} > 1.0 THEN "
        f"SQRT(({s2} - {s} * {s} / {n}) / ({n} - 1.0)) END AS {alias}"
    )
