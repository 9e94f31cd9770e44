"""Extended analytic operators beyond the reference's surface (SURVEY.md §2
"not present" rows, natural for a Spark-first engine): as-of join,
sessionization, ROLLUP, pivot, exact percentiles, salted skew aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.asof import asof_join
from bakery_big_data_spark.plans.base import dsum, register, sql_dsum, t


@register(
    "join_asof_latest_state",
    """
    WITH ev AS (
      SELECT event_id, user_id % 50 AS k, ts FROM events
    ), ord AS (
      SELECT o_custkey % 50 AS k, o_orderdate AS ots, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey % 50, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.k,
           o.o_orderkey AS matched_orderkey,
           o.o_totalprice AS matched_price
    FROM ev e ASOF LEFT JOIN ord o ON e.k = o.k AND e.ts >= o.ots
    """,
    doc="As-of join (Spark-first extension; no native ASOF in Spark): each "
        "event matched to the latest order at or before its timestamp via "
        "union + partitioned running-last — one shuffle, linear scan, no "
        "nested loop regardless of lookback depth (operators/asof.py)",
)
def join_asof_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 50).alias("k"), "ts"
    )
    dedup_w = Window.partitionBy("k", "ots").orderBy(F.col("o_orderkey").desc())
    orders = (
        t(spark, sf_dir, "orders")
        .select(
            (F.col("o_custkey") % 50).alias("k"),
            F.col("o_orderdate").alias("ots"),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    joined = asof_join(
        ev,
        orders,
        key="k",
        left_ts="ts",
        right_ts="ots",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "k",
        F.col("o_orderkey").alias("matched_orderkey"),
        F.col("o_totalprice").alias("matched_price"),
    )


@register(
    "sessionize_events",
    """
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_idx
    FROM g
    """,
    doc="Gap-based sessionization (30 min idle → new session): lag + "
        "cumulative flag sum per user — two windows over one shuffle, the "
        "batch counterpart of a streaming session window",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap <= 1800, 0).otherwise(1).alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session").over(cum).alias("session_idx"),
    )


@register(
    "rollup_aggregation",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (extension — reference has no cube/rollup, "
        "SURVEY.md §2.4): subtotals + grand total in one pass, map-side "
        "combinable expansion",
)
def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "pivot_status_matrix",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'F')},
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'O')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot proper (df.groupBy().pivot() with pinned values — extension; "
        "the reference only writes SUM(CASE…) pivots, §2.4 A3); pinned value "
        "list keeps the plan single-pass with no distinct-values pre-query",
)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double"))
    )


@register(
    "percentile_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           MIN(l_quantity) AS qmin,
           MAX(l_quantity) AS qmax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact percentiles (extension — reference has none, §2.4): "
        "percentile() with linear interpolation; the 100 TB variant is "
        "approx_percentile (t-digest), kept exact here for the oracle",
)
def percentile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
    )


@register(
    "skew_salted_aggregation",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY event_type
    """,
    doc="Skew-safe two-stage aggregation: partial agg on (key, salt=id%16) "
        "spreads a hot key over 16 reducers, final agg re-combines — "
        "decimal-exact sums make the result independent of the regrouping "
        "(the salting pattern for skewed keys at 100 TB; oracle is the plain "
        "single-stage GROUP BY)",
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("_salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("_v"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.sum("_v").cast("double").alias("total_value"),
    )


@register(
    "window_range_frame",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_30d
    FROM orders
    WHERE o_custkey <= 100
    """,
    doc="RANGE-frame window (value-based, not row-based — completes the "
        "frame taxonomy beyond the reference's rows frames, SURVEY §2.5): "
        "trailing-30-day revenue per customer; all orders in the window "
        "count regardless of row multiplicity",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("revenue_30d"),
    )


@register(
    "seeded_synthetic_features",
    None,  # rand() streams differ per engine; determinism (same seed → same
           # rows across runs) is asserted in tests/test_catalog.py
    doc="Seeded synthetic feature generation (reference "
        "update_ml_features.py:305-312 rand() batch-production features, "
        "made reproducible per SURVEY §7.3(f)): rand/randn with fixed seeds "
        "over the part×supplier cross of a bounded window",
)
def seeded_synthetic_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200).select("p_partkey")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10).select("s_suppkey")
    return (
        p.crossJoin(F.broadcast(s))
        .withColumn("planned_qty", (F.rand(seed=42) * 100 + 50).cast("int"))
        .withColumn("defect_rate", F.round(F.rand(seed=7) * 0.05, 4))
        .withColumn("temp_reading", F.round(F.randn(seed=99) * 5 + 180, 2))
    )


@register(
    "skew_salted_join",
    f"""
    WITH dim AS (
      SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS type_len
      FROM events
    )
    SELECT d.type_len,
           COUNT(*) AS n_events,
           {sql_dsum('e.value', 'total_value')}
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.type_len
    """,
    doc="Skew-safe salted shuffle join: the hot fact key (5 event types over "
        "the whole table) is split across 16 salt buckets and the dim side "
        "replicated per salt, so no single reducer owns a hot key — the "
        "mitigation for skewed joins too big to broadcast at 100 TB; oracle "
        "is the plain unsalted join, proving equivalence",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_len", F.length("event_type").cast("bigint"))
    )
    n_salt = 16
    # replicate the dim across salt ids; fact rows pick a deterministic salt
    salted_dim = dim.crossJoin(
        spark.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    )
    fact = ev.withColumn("_salt", (F.col("event_id") % n_salt).cast("int"))
    joined = fact.join(
        salted_dim.hint("shuffle_hash"), ["event_type", "_salt"]
    )
    return joined.groupBy("type_len").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )
