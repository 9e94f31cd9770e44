"""Projection / filter / predicate queries + the flagship pipeline query.

Covers SURVEY.md §2.2 (P1–P11) and §2.11 (quality scoring), re-expressed
over the driver's TPC-H-ish tables: ``lineitem``/``orders`` stand in for the
sales facts, small tables for dims (FIXTURES.md §7 mapping).
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
from bakery_big_data_spark.quality import (
    apply_quality_rules,
    quality_gate,
    sales_rules,
    sales_rules_sql,
)

# ---------------------------------------------------------------------------
# Flagship: quality-gated pricing summary (reference bronze→silver→agg path:
# scan → filter → derive → quality-score → gate → group-agg;
# bronze_to_silver.py:39-73 + silver_to_gold.py:298 semantics).
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily pricing summary with quality gating.

    Shape parity: reference Silver-sales transform (bronze_to_silver.py:53-73,
    quality fold :23-33,45-51) feeding the Gold revenue rollup
    (silver_to_gold.py:373-386).  Filter reaches the parquet scan (pushdown);
    the aggregate is a hash agg with map-side partial combine; no shuffle
    beyond the single groupBy — survives 100 TB by partition-pruning on the
    date predicate.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1999-12-31").cast("timestamp"))
    scored = apply_quality_rules(li, sales_rules())
    gated = quality_gate(scored, threshold=50)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = revenue * (1 + F.col("l_tax"))
    return (
        gated.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(revenue, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-31'
  AND {sales_rules_sql()} >= 50
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register("pricing_summary_quality_gated", FLAGSHIP_ORACLE,
         doc="Flagship: scan→quality-score→gate→hash-agg (bronze_to_silver.py:39-73)")(flagship)


# ---------------------------------------------------------------------------
# §2.11 config surface: rule sets + thresholds as data, report out.
# The reference gates at TWO parameterized levels — promote rows at
# score >= 50 (silver_to_gold.py:298) and short-circuit the whole batch
# when the avg score < 80 (orchestration/dags/bakery_batch_etl.py:54-62).
# This row proves the engine takes those as config, not constants: a
# NON-default rule set and NON-default promote threshold (80, the
# reference's pipeline-gate level) drive both the Spark plan and the
# oracle from the SAME dict (quality.config_score_sql).
# ---------------------------------------------------------------------------

#: Deployment-shaped config: predicates are portable SQL strings, so this
#: dict could live in JSON/YAML.  Penalties and thresholds deliberately
#: differ from the built-in sales_rules()/50 defaults.
CONFIGURED_QUALITY: dict = {
    "rules": [
        {"name": "tax_bounded", "predicate": "l_tax <= 0.07", "penalty": 15},
        {"name": "discount_sane", "predicate": "l_discount <= 0.3", "penalty": 30},
        {"name": "qty_cap", "predicate": "l_quantity <= 45", "penalty": 25},
        {"name": "line_no_sane", "predicate": "l_linenumber <= 6", "penalty": 10},
    ],
    "promote_threshold": 80,
    "pipeline_gate": 80,
}


def _configured_quality_oracle() -> str:
    from bakery_big_data_spark.quality import (
        config_score_sql,
        pipeline_gate_threshold,
        promote_threshold,
    )

    pt = promote_threshold(CONFIGURED_QUALITY)
    gate = pipeline_gate_threshold(CONFIGURED_QUALITY)
    return f"""
    WITH scored AS (
      SELECT l_returnflag, {config_score_sql(CONFIGURED_QUALITY)} AS score
      FROM lineitem
    ),
    batch AS (
      -- the reference's pipeline gate short-circuits on the avg over the
      -- WHOLE batch (bakery_batch_etl.py:54-62), not per group
      SELECT (CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE)
                / COUNT(score)) >= {gate} AS pipeline_gate_pass
      FROM scored
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_davg("score", "avg_score")},
           CAST(SUM(CASE WHEN score >= {pt} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_promoted,
           CAST(SUM(CASE WHEN score < {pt} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           (SELECT pipeline_gate_pass FROM batch) AS pipeline_gate_pass
    FROM scored
    GROUP BY l_returnflag
    """


@register(
    "quality_configured_gate",
    _configured_quality_oracle(),
    doc="§2.11 parameterized: dict-configured rule set + non-default promote "
        "threshold (80) + BATCH-GLOBAL pipeline gate (bakery_batch_etl.py:54-62 "
        "short-circuits the DAG on the whole-batch avg; silver_to_gold.py:298) "
        "— engine and oracle both rendered from the same config dict; map-only "
        "scoring, one hash-agg shuffle, gate attached via broadcast 1-row join",
)
def quality_configured_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.quality import (
        apply_quality_rules,
        pipeline_gate_threshold,
        promote_threshold,
        rules_from_config,
    )

    pt = promote_threshold(CONFIGURED_QUALITY)
    gate = pipeline_gate_threshold(CONFIGURED_QUALITY)
    scored = apply_quality_rules(
        t(spark, sf_dir, "lineitem"), rules_from_config(CONFIGURED_QUALITY)
    )
    score = F.col("data_quality_score")
    dec_sum = F.sum(score.cast("decimal(30,6)")).cast("double")
    # The reference evaluates the gate over the WHOLE batch and
    # short-circuits the DAG; here that decision is a 1-row aggregate
    # broadcast onto every group row (partial aggregation keeps it one
    # extra map-side pass, no extra wide shuffle at scale).
    batch_gate = scored.agg(
        ((dec_sum / F.count(score)) >= gate).alias("pipeline_gate_pass")
    )
    grouped = scored.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        davg(score, "avg_score"),
        F.sum(F.when(score >= pt, 1).otherwise(0)).alias("n_promoted"),
        F.sum(F.when(score < pt, 1).otherwise(0)).alias("n_quarantined"),
    )
    return grouped.crossJoin(F.broadcast(batch_gate))


# ---------------------------------------------------------------------------
# P-family: projections, predicates, conditionals
# ---------------------------------------------------------------------------


@register(
    "filter_project_cast",
    """
    SELECT o_orderkey,
           o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE) AS total_price_dec,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority AS priority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_custkey IS NOT NULL
    """,
    doc="P1/P3/P4/P5/P6/P7: projection, alias, decimal cast, null/range/set predicates "
        "(reference load_bronze_from_csv.py:32-46, bronze_to_silver.py:46-50)",
)
def filter_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            # P4 decimal cast exercised, but the *emitted* type is DOUBLE on
            # both sides — decimal wire representations differ across engines
            # and would fail the driver's typed value-hash.
            F.col("o_totalprice").cast("decimal(10,2)").cast("double").alias("total_price_dec"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


@register(
    "case_when_null_bucketing",
    """
    SELECT event_id,
           event_type,
           CASE
             WHEN EXTRACT(hour FROM ts) BETWEEN 5 AND 10 THEN 'morning'
             WHEN EXTRACT(hour FROM ts) BETWEEN 11 AND 13 THEN 'lunch'
             WHEN EXTRACT(hour FROM ts) BETWEEN 14 AND 17 THEN 'afternoon'
             WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 22 THEN 'evening'
             ELSE 'off_hours'
           END AS time_of_day,
           CASE WHEN value >= 50 THEN 'high' WHEN value >= 10 THEN 'mid' ELSE 'low' END AS value_band,
           COALESCE(NULLIF(event_type, 'error'), 'unknown') AS event_type_clean,
           COALESCE(value / NULLIF(user_id % 5, 0), 0.0) AS safe_ratio
    FROM events
    """,
    doc="P9+P11 conditional/null-handling projection: when/otherwise ladders "
        "(time_of_day bucketing, generate_sales_events.py:45-54, "
        "silver_to_gold.py:57-63) + coalesce/nullif defaults "
        "(update_ml_features.py:126,147,253-255); one map-only pass",
)
def case_when_null_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hour = F.hour("ts")
    return ev.select(
        "event_id",
        "event_type",
        F.when(hour.between(5, 10), "morning")
        .when(hour.between(11, 13), "lunch")
        .when(hour.between(14, 17), "afternoon")
        .when(hour.between(18, 22), "evening")
        .otherwise("off_hours")
        .alias("time_of_day"),
        F.when(F.col("value") >= 50, "high")
        .when(F.col("value") >= 10, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("unknown")).alias(
            "event_type_clean"
        ),
        F.coalesce(
            F.col("value") / F.nullif(F.col("user_id") % 5, F.lit(0)), F.lit(0.0)
        ).alias("safe_ratio"),
    )


@register(
    "report_quality_multi_table",
    f"""
    SELECT 'count' AS metric, table_name AS label, record_count AS n_rows,
           CAST(NULL AS DOUBLE) AS avg_qty
    FROM (
      SELECT 'orders' AS table_name, COUNT(*) AS record_count FROM orders
      UNION ALL
      SELECT 'lineitem', COUNT(*) FROM lineitem
      UNION ALL
      SELECT 'customer', COUNT(*) FROM customer
      UNION ALL
      SELECT 'events', COUNT(*) FROM events
    )
    UNION ALL
    SELECT 'quality' AS metric, score_band AS label, n_rows,
           avg_qty
    FROM (
      SELECT score_band,
             COUNT(*) AS n_rows,
             {sql_davg('l_quantity', 'avg_qty')}
      FROM (
        SELECT l_quantity,
               CASE WHEN q = 100 THEN 'perfect'
                    WHEN q >= 50 THEN 'acceptable'
                    ELSE 'poor' END AS score_band
        FROM (SELECT l_quantity, {sales_rules_sql()} AS q FROM lineitem)
      )
      GROUP BY score_band
    )
    """,
    doc="A10+U1/U2+A5+§2.11 unioned pipeline report: per-table record counts "
        "(bakery_csv_etl_pipeline.py:127-146) stacked with the quality-score "
        "rollup perfect/acceptable/poor (bronze_to_silver.py:242-278) — the "
        "reference's report assembly is exactly this union of per-entity aggs",
)
def report_quality_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str) -> DataFrame:
        return (
            t(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit("count").alias("metric"),
                F.lit(name).alias("label"),
                "n_rows",
                F.lit(None).cast("double").alias("avg_qty"),
            )
        )

    counts = one("orders").unionAll(one("lineitem")).unionAll(one("customer")).unionAll(one("events"))

    li = t(spark, sf_dir, "lineitem")
    scored = apply_quality_rules(li, sales_rules())
    q = F.col("data_quality_score")
    quality = (
        scored.select(
            "l_quantity",
            F.when(q == 100, "perfect")
            .when(q >= 50, "acceptable")
            .otherwise("poor")
            .alias("score_band"),
        )
        .groupBy("score_band")
        .agg(F.count(F.lit(1)).alias("n_rows"), davg("l_quantity", "avg_qty"))
        .select(
            F.lit("quality").alias("metric"),
            F.col("score_band").alias("label"),
            "n_rows",
            "avg_qty",
        )
    )
    return counts.unionAll(quality)
