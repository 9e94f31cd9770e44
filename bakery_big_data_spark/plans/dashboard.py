"""Dashboard-level queries — SURVEY.md §2.12: the Streamlit dashboard's
aggregations (``miri2_dashboard/app.py``) restated as engine queries (the
reference's dashboard is pandas-side and not runnable as committed; its
aggregations define query surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
    t,
)


@register(
    "dashboard_kpi_summary",
    f"""
    SELECT COUNT(*) AS n_transactions,
           {sql_dsum('o_totalprice', 'total_revenue')},
           {sql_davg('o_totalprice', 'avg_order_value')},
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fulfilled
    FROM orders
    """,
    doc="§2.12 KPI tile row (reference app.py:101-104 sums/ratios): one-row "
        "global scalar frame, no collect",
)
def dashboard_kpi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_transactions"),
        dsum("o_totalprice", "total_revenue"),
        davg("o_totalprice", "avg_order_value"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_fulfilled"),
    )


@register(
    "dashboard_stock_health",
    """
    WITH demand AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS daily_demand
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_partkey,
           CAST(p.p_partkey % 50 + 10 AS DOUBLE) / d.daily_demand AS days_of_supply,
           CASE
             WHEN CAST(p.p_partkey % 50 + 10 AS DOUBLE) / d.daily_demand < 2 THEN 'critical'
             WHEN CAST(p.p_partkey % 50 + 10 AS DOUBLE) / d.daily_demand <= 5 THEN 'low'
             ELSE 'healthy'
           END AS stock_health
    FROM part p JOIN demand d ON p.p_partkey = d.l_partkey
    """,
    doc="§2.12 days-of-supply stock-health bucketing <2 / 2-5 / >5 "
        "(reference app.py:139-154): per-product demand rate vs simulated "
        "on-hand stock, case-ladder banding",
)
def dashboard_stock_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    demand = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
            / F.countDistinct(F.col("l_shipdate").cast("date"))
        ).alias("daily_demand")
    )
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_partkey") % 50 + 10).cast("double").alias("stock_on_hand"),
    )
    dos = F.col("stock_on_hand") / F.col("daily_demand")
    return (
        p.join(demand, p.p_partkey == demand.l_partkey)
        .select(
            "p_partkey",
            dos.alias("days_of_supply"),
            F.when(dos < 2, "critical")
            .when(dos <= 5, "low")
            .otherwise("healthy")
            .alias("stock_health"),
        )
    )
