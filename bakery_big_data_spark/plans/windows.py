"""Window-function queries — SURVEY.md §2.5 (W1–W6).

Every window ORDER BY includes a unique tiebreak column and every frame is
explicit, so Spark and DuckDB agree row-for-row.  Rolling sums/averages use
decimal-exact frame sums (see plans.base).

Scale note: W1's global-order ``row_number`` (the reference's surrogate-key
assignment, silver_to_gold.py:157-159) single-partitions — acceptable only
on small dims.  The scalable dense-key operator is
``operators.keys.add_surrogate_key`` (partition-offset pattern); here we
demonstrate the reference semantics on the 100-row supplier dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import DEC, dsum, register, sql_dsum, t


@register(
    "window_surrogate_keys",
    """
    SELECT s_suppkey,
           s_name,
           1000 + ROW_NUMBER() OVER (ORDER BY s_suppkey) AS surrogate_key
    FROM supplier
    """,
    doc="W1 surrogate-key assignment: max_key + row_number over global order "
        "(reference silver_to_gold.py:157-159); small-dim-only pattern",
)
def window_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    w = Window.orderBy("s_suppkey")
    return s.select(
        "s_suppkey",
        "s_name",
        (F.lit(1000) + F.row_number().over(w)).alias("surrogate_key"),
    )


@register(
    "window_partitioned_sequence",
    """
    SELECT o_custkey,
           o_orderkey,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_sequence
    FROM orders
    WHERE o_custkey <= 100
    """,
    doc="W2 per-entity sequence numbering — transaction_sequence per store per day "
        "(reference silver_to_gold.py:315)",
)
def window_partitioned_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("order_sequence")
    )


@register(
    "window_lead_session_gap",
    """
    SELECT user_id,
           event_id,
           (epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            - epoch_us(ts)) / 3600000000.0 AS gap_hours
    FROM events
    WHERE user_id <= 50
    """,
    doc="W3 lead() next-event gap — operational-hours calc "
        "(reference bronze_to_silver.py:193-201); microsecond-integer arithmetic "
        "for cross-engine determinism",
)
def window_lead_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            / F.lit(3600000000.0)
        ).alias("gap_hours"),
    )


@register(
    "window_moving_average",
    f"""
    WITH daily AS (
      SELECT o_orderstatus,
             CAST(o_orderdate AS DATE) AS order_date,
             {sql_dsum('o_totalprice', 'daily_revenue')}
      FROM orders
      GROUP BY o_orderstatus, CAST(o_orderdate AS DATE)
    )
    SELECT o_orderstatus,
           order_date,
           daily_revenue,
           CAST(SUM(CAST(daily_revenue AS DECIMAL(30,6))) OVER w AS DOUBLE)
             / COUNT(daily_revenue) OVER w AS revenue_ma8
    FROM daily
    WINDOW w AS (
      PARTITION BY o_orderstatus ORDER BY order_date
      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
    )
    """,
    doc="W4 8-row trailing moving average over a daily rollup "
        "(reference update_ml_features.py:66-71 rowsBetween(-7,0))",
)
def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderstatus", F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(dsum("o_totalprice", "daily_revenue"))
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("order_date")
        .rowsBetween(-7, Window.currentRow)
    )
    return daily.select(
        "o_orderstatus",
        "order_date",
        "daily_revenue",
        (
            F.sum(F.col("daily_revenue").cast(DEC)).over(w).cast("double")
            / F.count("daily_revenue").over(w)
        ).alias("revenue_ma8"),
    )


@register(
    "window_cumulative_sum",
    """
    SELECT user_id,
           event_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    WHERE user_id <= 50
    """,
    doc="W5 cumulative sum per entity ordered by time "
        "(reference update_ml_features.py:190,198-201 running operational hours)",
)
def window_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_latest_row_with_context",
    """
    WITH ranked AS (
      SELECT o_custkey,
             o_orderkey,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS lifetime_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE) AS lifetime_value
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, lifetime_orders, lifetime_value
    FROM ranked
    WHERE rn = 1
    """,
    doc="W6 window-then-filter 'latest row with rolling context' "
        "(reference update_ml_features.py:72-77,201,219)",
)
def window_latest_row_with_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    w_all = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("lifetime_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).over(w_all).cast("double").alias("lifetime_value"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "window_rank_dense_ntile",
    """
    SELECT c_mktsegment,
           c_custkey,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4) OVER w AS bal_quartile,
           LAG(c_custkey) OVER w AS prev_custkey,
           FIRST_VALUE(c_custkey) OVER (
             w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS top_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Spark-first extension: rank/dense_rank/ntile/lag/first_value "
        "(absent from the reference — SURVEY.md §2.5 'not present')",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
        F.lag("c_custkey").over(w).alias("prev_custkey"),
        F.first("c_custkey").over(w_frame).alias("top_custkey"),
    )


@register(
    "topk_per_group",
    f"""
    WITH ranked AS (
      SELECT n.n_name AS nation_name,
             c.c_custkey,
             c.c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT nation_name, c_custkey, c_acctbal, rn AS rank_in_nation
    FROM ranked WHERE rn <= 3
    """,
    doc="O-family top-k per group via window ranking (reference's ranking mechanism "
        "is row_number, SURVEY.md §2.6); avoids any global sort",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("nation_name").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation_name"), "c_custkey", "c_acctbal")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
    )


@register(
    "order_by_limit_topk",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="O1/O2 global ORDER BY + LIMIT — Spark plans this as TakeOrderedAndProject "
        "(per-partition top-k + driver merge), no full sort at scale",
)
def order_by_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )
