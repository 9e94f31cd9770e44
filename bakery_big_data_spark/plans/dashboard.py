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
    "dashboard_summary",
    f"""
    WITH kpi AS (
      SELECT COUNT(*) AS n_transactions,
             {sql_dsum('o_totalprice', 'total_revenue')},
             {sql_davg('o_totalprice', 'avg_order_value')},
             COUNT(DISTINCT o_custkey) AS n_customers,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_fulfilled
      FROM orders
    ),
    demand AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS daily_demand
      FROM lineitem GROUP BY l_partkey
    ),
    health AS (
      SELECT CASE
               WHEN CAST(p.p_partkey % 50 + 10 AS DOUBLE) / d.daily_demand < 2 THEN 'critical'
               WHEN CAST(p.p_partkey % 50 + 10 AS DOUBLE) / d.daily_demand <= 5 THEN 'low'
               ELSE 'healthy'
             END AS stock_health
      FROM part p JOIN demand d ON p.p_partkey = d.l_partkey
    )
    SELECT 'n_transactions' AS metric, CAST(n_transactions AS DOUBLE) AS value FROM kpi
    UNION ALL SELECT 'total_revenue', total_revenue FROM kpi
    UNION ALL SELECT 'avg_order_value', avg_order_value FROM kpi
    UNION ALL SELECT 'n_customers', CAST(n_customers AS DOUBLE) FROM kpi
    UNION ALL SELECT 'n_fulfilled', CAST(n_fulfilled AS DOUBLE) FROM kpi
    UNION ALL
    SELECT 'stock_' || stock_health, CAST(COUNT(*) AS DOUBLE)
    FROM health GROUP BY stock_health
    """,
    doc="§2.12 dashboard summary tiles in one (metric, value) frame: the KPI "
        "row sums/ratios (reference app.py:101-104) unioned with the "
        "days-of-supply stock-health bucket counts <2 / 2-5 / >5 "
        "(app.py:139-154, per-product demand rate vs simulated on-hand "
        "stock).  The KPI branch is a 1-row global agg; the stock branch is "
        "one hash agg per part plus a tiny 3-row rollup — no collect anywhere",
)
def dashboard_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    kpi = o.agg(
        F.count(F.lit(1)).alias("n_transactions"),
        dsum("o_totalprice", "total_revenue"),
        davg("o_totalprice", "avg_order_value"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_fulfilled"),
    )
    # unpivot the 1-row KPI frame into (metric, value) tiles — ONE scan of
    # orders; a per-tile union would re-aggregate the table once per metric
    tiles = kpi.select(
        F.expr(
            "stack(5,"
            " 'n_transactions', CAST(n_transactions AS DOUBLE),"
            " 'total_revenue', total_revenue,"
            " 'avg_order_value', avg_order_value,"
            " 'n_customers', CAST(n_customers AS DOUBLE),"
            " 'n_fulfilled', CAST(n_fulfilled AS DOUBLE)"
            ") AS (metric, value)"
        )
    )

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
    stock = (
        p.join(demand, p.p_partkey == demand.l_partkey)
        .select(
            F.when(dos < 2, "critical")
            .when(dos <= 5, "low")
            .otherwise("healthy")
            .alias("stock_health")
        )
        .groupBy("stock_health")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .select(F.concat(F.lit("stock_"), F.col("stock_health")).alias("metric"), "value")
    )
    return tiles.unionAll(stock)
