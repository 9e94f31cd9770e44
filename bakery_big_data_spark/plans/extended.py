"""Extended analytic operators beyond the reference's surface (SURVEY.md §2
"not present" rows, natural for a Spark-first engine): as-of join,
sessionization, ROLLUP, pivot, exact percentiles, salted skew aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.asof import asof_join
from bakery_big_data_spark.operators.cache import PlanCache
from bakery_big_data_spark.plans.base import dsum, register, sql_dsum, t

# Holds the CMS bigram freq table, the MG sentinel-keyed stream, the
# logistic standardized corpus, and the two CMS per-key rollups — one
# artifact per family, sized so a full catalog sweep at one SF never
# LRU-thrashes mid-sweep (the _SIG_CACHE rationale; eviction unpersists,
# so the only cost of a miss is a rebuild).
_EXT_CACHE = PlanCache(max_entries=6)


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
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) <= 1800000000
                  THEN 0 ELSE 1 END AS new_session,
             (epoch_us(LEAD(ts) OVER w) - epoch_us(ts)) / 3600000000.0
               AS next_gap_hours
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, next_gap_hours,
           CAST(SUM(new_session) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_idx
    FROM g
    """,
    doc="W3 + sessionization in one frame: lead() next-event gap in hours "
        "(the reference's operational-hours calc, bronze_to_silver.py:193-201) "
        "and gap-based session ids (30 min idle → new session) via lag + "
        "cumulative flag sum.  Gaps compare at MICROSECOND precision "
        "(unix_micros vs the oracle's epoch_us) so sub-second timestamp parts "
        "can never flip a session boundary across engines.  lag, lead and the "
        "running sum share one partition/order — a single shuffle, the batch "
        "counterpart of a streaming session window",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap_us <= 1800 * 1_000_000, 0).otherwise(1).alias("new_session"),
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            / F.lit(3600000000.0)
        ).alias("next_gap_hours"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "event_id",
        "user_id",
        "next_gap_hours",
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


_LCG_M = 2147483647  # 2^31 - 1; all mixes stay far below 2^63 (ANSI-safe)


def _lcg_uniform_sql(a: int, b: int, c: int) -> str:
    return f"((p_partkey * {a} + s_suppkey * {b} + {c}) % {_LCG_M}) / {float(_LCG_M)}"


@register(
    "seeded_synthetic_features",
    f"""
    SELECT p_partkey, s_suppkey,
           CAST(FLOOR({_lcg_uniform_sql(2654435761, 40503, 12345)} * 100 + 50) AS INT)
             AS planned_qty,
           FLOOR({_lcg_uniform_sql(997001, 65537, 424242)} * 0.05 * 10000.0) / 10000.0
             AS defect_rate,
           FLOOR((180.0 + ({_lcg_uniform_sql(179424673, 15485863, 7)}
                           + {_lcg_uniform_sql(32452843, 49979687, 99)} - 1.0) * 5.0)
                 * 100.0) / 100.0
             AS temp_reading
    FROM (SELECT p_partkey FROM part WHERE p_partkey <= 200)
    CROSS JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey <= 10)
    """,
    doc="Seeded synthetic feature generation (reference "
        "update_ml_features.py:305-312 rand() batch-production features, made "
        "reproducible per SURVEY §7.3(f)).  Pseudo-randoms are KEY-DERIVED — "
        "multiplicative-hash uniforms u = ((k1*a + k2*b + c) mod (2^31-1)) / "
        "(2^31-1) — so every value is a pure function of the business key: "
        "identical under any partition layout, cluster size, or engine "
        "(F.rand(seed) is only fixed per layout).  The 'normal' temperature "
        "uses an Irwin-Hall sum of two uniforms, avoiding transcendental "
        "functions whose last-bit behavior differs across libm builds",
)
def seeded_synthetic_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200).select("p_partkey")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10).select("s_suppkey")

    def u(a: int, b: int, c: int):
        mixed = (
            F.col("p_partkey").cast("bigint") * a
            + F.col("s_suppkey").cast("bigint") * b
            + F.lit(c)
        ) % _LCG_M
        return mixed / F.lit(float(_LCG_M))

    u1 = u(2654435761, 40503, 12345)
    u2 = u(997001, 65537, 424242)
    u3 = u(179424673, 15485863, 7)
    u4 = u(32452843, 49979687, 99)
    return p.crossJoin(F.broadcast(s)).select(
        "p_partkey",
        "s_suppkey",
        F.floor(u1 * 100 + 50).cast("int").alias("planned_qty"),
        (F.floor(u2 * 0.05 * 10000.0) / 10000.0).alias("defect_rate"),
        (F.floor((180.0 + (u3 + u4 - 1.0) * 5.0) * 100.0) / 100.0).alias("temp_reading"),
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


@register(
    "grouping_sets_matrix",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           {sql_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS (detail + both one-dimension margins in one "
        "pass) with GROUPING() flags disambiguating real NULLs from "
        "subtotal rows — the general form behind ROLLUP/CUBE (extension; "
        "reference has none, SURVEY §2.4).  Spark expands sets before the "
        "exchange, so partial aggregation stays map-side combinable: one "
        "shuffle for all three groupings",
)
def grouping_sets_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        """
    )


@register(
    "unpivot_metrics",
    f"""
    WITH wide AS (
      SELECT o_orderstatus,
             {sql_dsum('o_totalprice', 'total_price')},
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM wide
    UNION ALL
    SELECT o_orderstatus, 'n_orders', n_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'n_customers', n_customers FROM wide
    """,
    doc="Unpivot / melt (DataFrame.unpivot, the inverse of A3's pivot — "
        "extension, §2.4): a wide per-status metrics row becomes one "
        "(status, metric, value) row per measure.  unpivot is a map-only "
        "expand on the already-aggregated frame (3 rows out per row in) — "
        "no shuffle beyond the feeding aggregation",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        dsum("o_totalprice", "total_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["total_price", "n_orders", "n_customers"],
        "metric",
        "value",
    )


@register(
    "sketch_incremental_distinct",
    """
    SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_distinct_users,
           TRUE AS within_bound
    FROM events
    """,
    doc="Mergeable-sketch incremental distinct counting: per-day HLL "
        "sketches of user_id (hll_sketch_agg — the frame you'd PERSIST as a "
        "gold pre-aggregate) merged with hll_union_agg into the 30-day "
        "distinct estimate.  The 100 TB point: any date-range distinct "
        "count re-aggregates from day-level sketches (KBs/day) without "
        "rescanning raw events, and sketch merge is associative so partial "
        "merges combine map-side; exact COUNT(DISTINCT) over the same "
        "range re-shuffles every raw row every query.  DataSketches "
        "internals are engine-specific, so the row is certified the "
        "ANN-recall way: the MERGED estimate must land within 5% of exact "
        "(lgConfigK=12 → rsd 1.6%, a 3σ margin; measured 0.8% at sf0.1) — "
        "the oracle states the bound as TRUE, making sketch persistence + "
        "merge + estimate a hash-checked quantitative signal",
)
def sketch_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("_day_users"),
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("_est"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "n_events",
        "exact_distinct_users",
        (
            F.abs(F.col("_est") - F.col("exact_distinct_users"))
            / F.col("exact_distinct_users").cast("double")
            <= 0.05
        ).alias("within_bound"),
    )


@register(
    "join_asof_tolerance",
    """
    WITH ev AS (
      SELECT event_id, user_id % 50 AS k, ts FROM events
    ), ord AS (
      SELECT o_custkey % 50 AS k, o_orderdate AS ots, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey % 50, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    ), matched AS (
      SELECT e.event_id, e.k, e.ts, o.ots, o.o_orderkey, o.o_totalprice
      FROM ev e ASOF LEFT JOIN ord o ON e.k = o.k AND e.ts >= o.ots
    )
    SELECT event_id, k,
           CASE WHEN ts - ots <= INTERVAL 30 DAY THEN o_orderkey END
             AS matched_orderkey,
           CASE WHEN ts - ots <= INTERVAL 30 DAY THEN o_totalprice END
             AS matched_price,
           COALESCE(ts - ots <= INTERVAL 30 DAY, FALSE) AS within_tolerance
    FROM matched
    """,
    doc="As-of join with a staleness tolerance: the latest state at or "
        "before each event counts only if it is at most 30 days old — "
        "older matches null out exactly like no-match (the time-series "
        "enrichment rule that stops a years-stale dimension row from "
        "silently attaching).  Composed over the same union + "
        "partitioned-running-last operator as join_asof_latest_state (the "
        "as-of timestamp rides along as payload; the tolerance is a "
        "map-side post-predicate) — still one shuffle, no nested loop",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        payload_cols=["ots", "o_orderkey", "o_totalprice"],
    )
    fresh = F.col("ts") <= F.col("ots") + F.expr("INTERVAL 30 DAYS")
    return joined.select(
        "event_id",
        "k",
        F.when(fresh, F.col("o_orderkey")).alias("matched_orderkey"),
        F.when(fresh, F.col("o_totalprice")).alias("matched_price"),
        F.coalesce(fresh, F.lit(False)).alias("within_tolerance"),
    )


@register(
    "window_distribution_ranks",
    """
    SELECT o_orderkey, o_orderstatus,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTH_VALUE(o_totalprice, 3) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_lowest_price
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution-rank window functions (percent_rank, cume_dist, "
        "nth_value) over a unique total order per status — the remaining "
        "§2.5 ranking surface beyond rank/dense_rank/ntile.  One window "
        "partition pass; nth_value uses an explicit unbounded frame so "
        "both engines see the whole partition",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_totalprice", 3).over(wf).alias("third_lowest_price"),
    )


@register(
    "fuzzy_name_match_blocked",
    """
    WITH blocked AS (
      SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="Blocked fuzzy matching (entity resolution): candidate pairs come "
        "from an equi-join on a blocking key (16-char name prefix, sized so blocks stay ~100 rows) — never "
        "all-pairs — and survive on Levenshtein distance <= 1 (identical "
        "DP algorithm in both engines).  A |length(a)-length(b)| <= 1 "
        "pre-filter (a lower bound on edit distance) guards the DP cost "
        "in pathological blocks.  The blocking-key join is the "
        "standard scale shape for fuzzy dedup: candidate volume is "
        "sum(block²) not n², and the block key can be swapped for "
        "phonetic/sorted-neighborhood keys without touching the plan",
)
def fuzzy_name_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "blk",
    )
    pairs = a.join(b, "blk").filter(F.col("key_a") < F.col("key_b"))
    # cheap length pre-filter: |len(a)-len(b)| is a lower bound on edit
    # distance; then the THRESHOLD form of levenshtein — banded DP, O(len)
    # instead of O(len²) per pair, returning -1 above the bound (for
    # surviving pairs the band returns the true distance, so the output
    # column is identical to the unbounded DP's).  The DP runs on the
    # SUFFIXES after the shared block prefix: common-prefix stripping is
    # an exact Levenshtein identity (lev(P||s, P||t) == lev(s, t) — the
    # standard trimming optimization every edit-distance library applies),
    # and the blk equi-join guarantees the first 16 chars are equal, so
    # the per-pair DP touches ~2 chars instead of ~18
    len_gap = F.abs(F.length("name_a") - F.length("name_b"))
    dist = F.levenshtein(
        F.substring("name_a", 17, 2**30), F.substring("name_b", 17, 2**30), 1
    )
    return pairs.filter((len_gap <= 1) & (dist >= 0)).select(
        "key_a", "key_b", dist.alias("edit_dist")
    )


@register(
    "er_fuzzy_clusters",
    """
    WITH RECURSIVE blocked AS (
      SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer
    ), pairs AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), edges AS (
      SELECT key_a AS a, key_b AS b FROM pairs
      UNION ALL SELECT key_b, key_a FROM pairs
    ), reach(node, r) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
    )
    SELECT node AS c_custkey, CAST(MIN(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="Entity-resolution clusters: TRUE connected components over the "
        "blocked fuzzy-match graph (Levenshtein <= 1 pairs chain "
        "transitively — at sf0.01 the 1,500 customers collapse into 15 "
        "clusters, which a one-pass star contraction would get wrong).  "
        "Spark side is the iterative min-label propagation operator; the "
        "oracle is a RECURSIVE-CTE transitive closure with per-node "
        "reachable-minimum — the first driver row whose oracle itself "
        "runs a fixpoint, so the iteration's convergence (not just one "
        "round) is hash-certified",
)
def er_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.dedup import connected_components

    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    a = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), "blk")
    b = c.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"), "blk")
    len_gap = F.abs(F.length("name_a") - F.length("name_b"))
    # suffix-only banded DP — exact via common-prefix stripping, see
    # fuzzy_name_match_blocked above
    dist = F.levenshtein(
        F.substring("name_a", 17, 2**30), F.substring("name_b", 17, 2**30), 1
    )
    pairs = (
        a.join(b, "blk")
        .filter((F.col("key_a") < F.col("key_b")) & (len_gap <= 1) & (dist >= 0))
        .select(F.col("key_a").alias("id_a"), F.col("key_b").alias("id_b"))
    )
    vertices = c.select("c_custkey")
    labels = connected_components(vertices, pairs, "c_custkey", max_iter=20)
    return labels.select(
        "c_custkey", F.col("canonical_id").cast("bigint").alias("cluster_id")
    )


@register(
    "quantile_exact_scalable",
    """
    WITH ranked AS (
      SELECT l_extendedprice,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice,
                                         l_orderkey, l_linenumber) AS rk,
             COUNT(*) OVER () AS n
      FROM lineitem
    ), targets AS (
      -- q cast to DOUBLE: DuckDB's unnest([0.5, ...]) is DECIMAL and
      -- would serialize '0.50' against Spark's double '0.5'
      SELECT CAST(q AS DOUBLE) AS q, CAST(CEIL(q * n) AS BIGINT) AS target, n
      FROM (SELECT DISTINCT n, unnest([0.5, 0.9, 0.99]) AS q FROM ranked)
    )
    SELECT t.q AS quantile,
           CAST(r.l_extendedprice AS DOUBLE) AS value,
           t.target AS rank, t.n AS n_rows
    FROM targets t JOIN ranked r ON r.rk = t.target
    """,
    doc="EXACT global quantiles at 100 TB scale — the distributed path "
        "percentile_quantiles' docstring defers to, made real: the global "
        "rank comes from add_surrogate_key's range-partition decomposition "
        "(fully parallel, no single-task global window) over a total "
        "order, targets are rank = ceil(q*n) from the lazy 1-row count, "
        "and the answer rows are selected by an equi-join on rank.  "
        "Contract: discrete (type-1) quantile, value at the ceil(q*n)-th "
        "smallest — stated identically in the oracle's ROW_NUMBER "
        "restatement, so the hash certifies the decomposition is "
        "rank-exact, not merely approximately right",
)
def quantile_exact_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.keys import add_surrogate_key

    li = t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = add_surrogate_key(
        li,
        [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        key_col="rk",
    )
    # count from the raw scan, not from `ranked` — the latter would run
    # the whole range-decomposition machinery a second time just to count
    n_row = li.groupBy().agg(F.count(F.lit(1)).alias("n"))
    targets = (
        n_row.select(
            F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
                "quantile"
            ),
            "n",
        )
        .select(
            "quantile",
            F.ceil(F.col("quantile") * F.col("n")).cast("bigint").alias("rank"),
            "n",
        )
    )
    return (
        ranked.join(F.broadcast(targets), F.col("rk") == F.col("rank"))
        .select(
            "quantile",
            F.col("l_extendedprice").cast("double").alias("value"),
            "rank",
            F.col("n").alias("n_rows"),
        )
    )


def _cms_case(vals: list[int]) -> str:
    return (
        "(CASE t.i "
        + " ".join(f"WHEN {i} THEN {v}" for i, v in enumerate(vals))
        + " END)"
    )


@register(
    "sketch_count_min_heavy_hitters",
    # the oracle rebuilds the identical sketch: same md5-half base hash,
    # same Carter-Wegman row parameters, exact BIGINT arithmetic
    f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS ws FROM documents
    ), bg AS (
      SELECT ws[i] || '_' || ws[i+1] AS g
      FROM toks, unnest(range(1, len(ws))) AS t(i)
      WHERE ws[i] <> '' AND ws[i+1] <> ''
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM bg
    ), hashed AS (
      SELECT g, ('0x' || substr(md5(g), 1, 8))::BIGINT & 2147483647 AS h
      FROM bg
    ), cells AS (
      SELECT t.i AS row,
             (({_cms_case([1, 1566083941, 998244353, 1103515245])} * h
               + {_cms_case([0, 97531, 12345, 424243])})
              % 2147483647) % 512 AS bucket
      FROM hashed, unnest([0, 1, 2, 3]) AS t(i)
    ), cms AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ), exact AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM bg GROUP BY g
      ORDER BY true_count DESC, g LIMIT 20
    ), probes AS (
      SELECT e.g, e.true_count, t.i AS row,
             (({_cms_case([1, 1566083941, 998244353, 1103515245])} * e.h
               + {_cms_case([0, 97531, 12345, 424243])})
              % 2147483647) % 512 AS bucket
      FROM (
        SELECT g, true_count,
               ('0x' || substr(md5(g), 1, 8))::BIGINT & 2147483647 AS h
        FROM exact
      ) e, unnest([0, 1, 2, 3]) AS t(i)
    ), est AS (
      SELECT g, true_count,
             CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
      FROM probes p LEFT JOIN cms c USING (row, bucket)
      GROUP BY 1, 2
    )
    SELECT g AS bigram, true_count, est_count,
           est_count >= true_count
             AND est_count <= true_count + (3 * n_tok) // 512
             AS within_bound
    FROM est, n
    """,
    doc="Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) — "
        "the frequency-estimation workhorse beside the HLL row: a 4x512 "
        "counter grid built in ONE map-side-combinable aggregation (the "
        "shuffle carries at most depth*width rows per mapper regardless "
        "of key cardinality; cell-wise addition merges sketches, the same "
        "mergeability the incremental-HLL row exploits), then the top-20 "
        "exact bigrams point-queried against it: est = MIN over 4 "
        "counters.  Output certifies the CMS contract per key — "
        "est >= true always, est <= true + 3N/width (3 > e) — and every "
        "counter is bit-identical cross-engine (md5-half base hash + "
        "Carter-Wegman rows in exact BIGINT), so the oracle certifies "
        "build AND estimate (operators/sketches.py)",
)
def sketch_count_min_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )
    from bakery_big_data_spark.plans.base import spread
    from bakery_big_data_spark.plans.textops import _adjacent_pairs

    d = spread(t(spark, sf_dir, "documents").select("text"))
    ws = F.split(F.col("text"), " ")
    # The per-bigram FREQUENCY table (not the raw occurrence stream) is
    # the shared artifact: N rides as SUM(f), the sketch builds weighted
    # from it (bit-identical counters, |distinct bigrams| explode instead
    # of |occurrences|), and the exact top-20 is its ORDER BY head — one
    # explode+rollup pass over the corpus total, where the occurrence-
    # stream form re-aggregated the cached stream three times.  Memoized
    # per (session, sf) through the bounded PlanCache.
    bgf = _EXT_CACHE.get_or_build(
        spark,
        (sf_dir, "cms_bigram_freq"),
        lambda: d.select(F.explode(_adjacent_pairs(ws)).alias("p"))
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select(F.concat_ws("_", "p.w1", "p.w2").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist(),
    )
    n_row = bgf.groupBy().agg(F.sum("f").alias("n_tok"))
    sketch = count_min_build(bgf, "g", depth=4, width=512, weight_col="f")
    exact = (
        bgf.select("g", F.col("f").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "g")
        .limit(20)
    )
    est = count_min_estimate(exact, sketch, "g", depth=4, width=512)
    return (
        exact.join(est, "g")
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("g").alias("bigram"),
            "true_count",
            "est_count",
            (
                (F.col("est_count") >= F.col("true_count"))
                & (
                    F.col("est_count")
                    <= F.col("true_count")
                    + F.expr("(3 * n_tok) div 512")
                )
            ).alias("within_bound"),
        )
    )


@register(
    "scd2_point_in_time_join",
    """
    SELECT o.o_orderkey,
           o.o_custkey AS c_custkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CASE WHEN c.c_custkey IS NULL THEN NULL
                WHEN o.o_orderdate < TIMESTAMP '1998-07-01' THEN
                     CASE WHEN c.c_custkey <= 1200
                          THEN c.c_mktsegment ELSE NULL END
                ELSE CASE WHEN c.c_custkey % 5 = 0 THEN 'SEGMENT-NEW'
                          ELSE c.c_mktsegment END
           END AS segment_at_order,
           CASE WHEN c.c_custkey IS NULL THEN NULL
                WHEN o.o_orderdate < TIMESTAMP '1998-07-01' THEN
                     CASE WHEN c.c_custkey <= 1200
                          THEN c.c_acctbal ELSE NULL END
                -- post-effective: existing keys (<=1200) version only when
                -- the drift condition fires (segment change or >5% balance
                -- move — the 1.02x path is below threshold and keeps v1);
                -- late-added keys carry their staged attributes directly
                ELSE CASE WHEN c.c_custkey <= 1200
                               AND c.c_custkey % 5 <> 0
                               AND c.c_custkey % 7 <> 0
                          THEN c.c_acctbal
                          ELSE CASE WHEN c.c_custkey % 7 = 0
                                    THEN c.c_acctbal * 1.1
                                    WHEN c.c_custkey % 11 = 0
                                    THEN c.c_acctbal * 1.02
                                    ELSE c.c_acctbal END
                     END
           END AS acctbal_at_order
    FROM orders o LEFT JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_custkey <= 1400
    """,
    doc="SCD2 POINT-IN-TIME join — the classic warehouse question 'what "
        "did the dimension say when this fact happened': a real SCD2 "
        "version table (built by operators/mutation.py::scd2_apply — "
        "v1 from 1995-01-01, drift applied effective 1998-07-01 with the "
        "segment-or->5%-balance drift condition, late-added keys "
        "1201-1400 first versioned at the effective date) joined to every "
        "order AS OF its order date via the as-of machinery "
        "(operators/asof.py — union + partitioned running-last, a "
        "PARTITIONED window, never a range/theta join).  The oracle "
        "states the version-resolution rules in closed form (which "
        "version is valid at each order date and what attributes it "
        "carries, drift semantics included), so the hash certifies "
        "scd2_apply's version table AND the PIT resolution end to end — "
        "orders before a late-added key's first version correctly "
        "resolve to NULL, not to attributes from the future",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.mutation import scd2_apply

    cust = t(spark, sf_dir, "customer")
    current = cust.filter(F.col("c_custkey") <= 1200).select(
        (F.col("c_custkey") * 10).cast("bigint").alias("surrogate_key"),
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("1995-01-01").cast("date").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.lit(True).alias("is_current"),
    )
    staged = cust.filter(F.col("c_custkey") <= 1400).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, "SEGMENT-NEW")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") * 1.1)
        .when(F.col("c_custkey") % 11 == 0, F.col("c_acctbal") * 1.02)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
    )
    versions = scd2_apply(
        current,
        staged,
        business_key="c_custkey",
        tracked=["segment", "acctbal"],
        effective_date="1998-07-01",
        key_base=None,
        drift_condition=(
            (F.col("segment") != F.col("_cur_segment"))
            | (
                F.abs(F.col("acctbal") - F.col("_cur_acctbal"))
                / F.nullif(F.abs(F.col("_cur_acctbal")), F.lit(0))
                > 0.05
            )
        ),
    ).select(
        "c_custkey",
        "start_date",
        F.col("segment").alias("segment_at_order"),
        F.col("acctbal").alias("acctbal_at_order"),
    )

    facts = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.to_date("o_orderdate").alias("order_date"),
    )
    from bakery_big_data_spark.operators.asof import asof_join

    return asof_join(
        facts,
        versions,
        key="c_custkey",
        left_ts="order_date",
        right_ts="start_date",
        payload_cols=["segment_at_order", "acctbal_at_order"],
    ).select(
        "o_orderkey",
        "c_custkey",
        "order_date",
        "segment_at_order",
        "acctbal_at_order",
    )


def _bloom_oracle() -> str:
    """Re-derive the full Bloom build + probe in DuckDB: same md5-half
    base hash, same Carter-Wegman bit positions, same 63-bit words and
    bit_or/bool_and folds as operators/sketches.py — every filter word
    and every membership verdict is bit-identical cross-engine."""
    from bakery_big_data_spark.operators.sketches import BLOOM_A, BLOOM_B

    def h(k: str) -> str:
        return (
            f"(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8))::BIGINT"
            " & 2147483647)"
        )

    def poses() -> str:
        return "[" + ", ".join(
            f"(({a} * h + {b}) % 2147483647) % 32256"
            for a, b in zip(BLOOM_A, BLOOM_B)
        ) + "]"

    return f"""
    WITH bcells AS (
      SELECT pos // 63 AS word,
             (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS mask
      FROM (SELECT unnest({poses()}) AS pos
            FROM (SELECT {h('o_custkey')} AS h FROM orders
                  WHERE o_orderpriority = '1-URGENT'))
    ), bloom AS (
      SELECT word, bit_or(mask) AS bits FROM bcells GROUP BY word
    ), pcells AS (
      SELECT c_custkey, pos // 63 AS word,
             (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS mask
      FROM (SELECT c_custkey, unnest({poses()}) AS pos
            FROM (SELECT c_custkey, {h('c_custkey')} AS h FROM customer))
    ), probed AS (
      SELECT p.c_custkey,
             bool_and((COALESCE(b.bits, 0) & p.mask) = p.mask) AS in_bloom
      FROM pcells p LEFT JOIN bloom b USING (word)
      GROUP BY p.c_custkey
    ), act AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT p.c_custkey, p.in_bloom,
           a.c_custkey IS NOT NULL AS actually_in,
           p.in_bloom AND a.c_custkey IS NULL AS false_positive
    FROM probed p LEFT JOIN act a ON a.c_custkey = p.c_custkey
    """


@register(
    "sketch_bloom_semijoin",
    _bloom_oracle(),
    doc="Portable Bloom filter as the semi-join-reduction sketch — the "
        "runtime row-level-filtering pattern at 100 TB (build a ~4 KB "
        "filter over the dim-side keys, broadcast it to the fact scan, "
        "and discard non-members BEFORE any shuffle; Spark's own "
        "spark.sql.optimizer.runtimeFilter does this internally — here "
        "it is a first-class, engine-portable operator).  Build is ONE "
        "bit_or aggregation (map-side combinable, <= num_bits/63 word "
        "rows per mapper, duplicates free since OR is idempotent — no "
        "DISTINCT pass; two builds merge by word-wise OR, the CMS/HLL "
        "mergeability); probe is a broadcast map-side join, zero shuffle "
        "of the probe side.  md5-half base hash + Carter-Wegman bit "
        "positions in exact BIGINT arithmetic over 63-bit words (the "
        "sign bit never flips), so the oracle re-derives every filter "
        "word AND every membership verdict bit-for-bit — including the "
        "false positives, certified as exactly the same keys cross-"
        "engine; no-false-negative is certified by in_bloom covering "
        "every actually_in key (operators/sketches.py::bloom_build/"
        "bloom_probe)",
)
def sketch_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    c = t(spark, sf_dir, "customer").select("c_custkey")
    bl = bloom_build(o, "o_custkey")
    probed = bloom_probe(c, bl, "c_custkey")
    act = (
        o.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_a", F.lit(True))
    )
    return probed.join(act, "c_custkey", "left").select(
        "c_custkey",
        "in_bloom",
        F.coalesce(F.col("_a"), F.lit(False)).alias("actually_in"),
        (F.col("in_bloom") & F.col("_a").isNull()).alias("false_positive"),
    )


_KMV_K = 64


@register(
    "sketch_kmv_set_ops",
    f"""
    WITH src AS (
      SELECT DISTINCT
             CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 'a' ELSE 'b' END
               AS side,
             user_id
      FROM events
    ), dh AS (
      SELECT DISTINCT side,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM src
    ), ranked AS (
      SELECT side, h, ROW_NUMBER() OVER (PARTITION BY side ORDER BY h) AS rn
      FROM dh
    ), arrs AS (
      SELECT side, list_sort(list(h)) AS arr
      FROM ranked WHERE rn <= {_KMV_K} GROUP BY side
    ), ex AS (
      SELECT
        (SELECT COUNT(DISTINCT user_id) FROM src WHERE side = 'a')
          AS exact_a,
        (SELECT COUNT(DISTINCT user_id) FROM src WHERE side = 'b')
          AS exact_b,
        (SELECT COUNT(DISTINCT user_id) FROM src) AS exact_union,
        (SELECT COUNT(*) FROM
           (SELECT user_id FROM src WHERE side = 'a') sa
           JOIN (SELECT user_id FROM src WHERE side = 'b') sb
           USING (user_id)) AS exact_intersect
    ), one AS (
      SELECT (SELECT arr FROM arrs WHERE side = 'a') AS a_arr,
             (SELECT arr FROM arrs WHERE side = 'b') AS b_arr
    ), merged AS (
      SELECT a_arr, b_arr,
             list_sort(list_distinct(list_concat(a_arr, b_arr)))
               [1:{_KMV_K}] AS u_arr
      FROM one
    ), probed AS (
      SELECT a_arr, b_arr, u_arr,
             len(list_filter(u_arr, x -> list_contains(a_arr, x)
                                     AND list_contains(b_arr, x)))
               AS n_both,
             CASE WHEN len(a_arr) < {_KMV_K}
                  THEN CAST(len(a_arr) AS DOUBLE)
                  ELSE (CAST({_KMV_K - 1} AS DOUBLE)
                        * CAST(1152921504606846976 AS DOUBLE))
                       / CAST(a_arr[{_KMV_K}] AS DOUBLE) END AS est_a,
             CASE WHEN len(b_arr) < {_KMV_K}
                  THEN CAST(len(b_arr) AS DOUBLE)
                  ELSE (CAST({_KMV_K - 1} AS DOUBLE)
                        * CAST(1152921504606846976 AS DOUBLE))
                       / CAST(b_arr[{_KMV_K}] AS DOUBLE) END AS est_b,
             CASE WHEN len(list_sort(list_distinct(
                         list_concat(a_arr, b_arr)))[1:{_KMV_K}]) < {_KMV_K}
                  THEN CAST(len(list_sort(list_distinct(
                         list_concat(a_arr, b_arr)))[1:{_KMV_K}]) AS DOUBLE)
                  ELSE (CAST({_KMV_K - 1} AS DOUBLE)
                        * CAST(1152921504606846976 AS DOUBLE))
                       / CAST(list_sort(list_distinct(list_concat(
                           a_arr, b_arr)))[1:{_KMV_K}][{_KMV_K}] AS DOUBLE)
                  END AS est_union
      FROM merged
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_intersect,
           p.est_a, p.est_b, p.est_union,
           CASE WHEN len(p.u_arr) < {_KMV_K} THEN CAST(p.n_both AS DOUBLE)
                ELSE (CAST(p.n_both AS DOUBLE) / CAST({_KMV_K} AS DOUBLE))
                     * p.est_union END AS est_intersect
    FROM probed p CROSS JOIN ex
    """,
    doc="KMV (bottom-k / theta-style) distinct sketch with SET "
        "OPERATIONS, certified bit-for-bit including the estimates: the "
        "k=64 smallest portable 60-bit hashes (md5 15-hex-digit prefix) "
        "of each half-month user cohort, merged sketch = bottom-k of the "
        "concatenation, union estimate (k-1)*2^60/h_k, intersection via "
        "the theta inclusion fraction — the set algebra HLL registers "
        "cannot do (approx_count_distinct_scale carries the HLL bound "
        "row; this row carries union/intersect), mergeable across "
        "days/partitions like the CMS and Bloom rows.  Exact cohort "
        "sizes ride along so the row certifies the ERROR too.  Scale "
        "shape (operators/sketches.py::kmv_side_sketches): one distinct "
        "hash-agg, then salt-bucketed rank -> rank over the "
        "salt_buckets*k survivors — no single-reducer sort, windows "
        "spill gracefully; the final assembly is 1-row frames",
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import (
        kmv_estimate,
        kmv_side_sketches,
    )

    k = _KMV_K
    ev = t(spark, sf_dir, "events")
    src = ev.select(
        F.when(F.dayofmonth("ts") <= 15, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("side"),
        "user_id",
    ).distinct()
    # r13: ONE distinct pass feeds the sketches AND every exact leg —
    # the row previously re-ran the events scan + global distinct SIX
    # times (one per exact aggregate + the sketch + the intersect join;
    # guide §1.2).  The cut stops the two consumers below re-executing
    # the scan+distinct; ~2×|users| rows.
    from bakery_big_data_spark.operators.checkpointing import cut_lineage

    src = cut_lineage(src, None)
    sk = kmv_side_sketches(src, "side", "user_id", k=k, salt_buckets=32)
    a = sk.filter(F.col("side") == "a").select(F.col("arr").alias("a_arr"))
    b = sk.filter(F.col("side") == "b").select(F.col("arr").alias("b_arr"))
    # per-user side membership: every exact count is a conditional count
    # over this rollup (src is distinct (side, user) pairs, so
    # countDistinct-per-side == count of users whose membership flag is
    # set — identical integers to the former four separate aggregates)
    m = src.groupBy("user_id").agg(
        F.max(F.col("side") == "a").alias("_in_a"),
        F.max(F.col("side") == "b").alias("_in_b"),
    )
    exacts = m.agg(
        F.count(F.when(F.col("_in_a"), F.lit(1))).alias("exact_a"),
        F.count(F.when(F.col("_in_b"), F.lit(1))).alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.count(
            F.when(F.col("_in_a") & F.col("_in_b"), F.lit(1))
        ).alias("exact_intersect"),
    )
    row = a.crossJoin(b).crossJoin(F.broadcast(exacts))
    u_arr = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("a_arr"), F.col("b_arr")))),
        1,
        k,
    )
    row = row.withColumn("u_arr", u_arr).withColumn(
        "n_both",
        F.size(
            F.filter(
                F.col("u_arr"),
                lambda x: F.array_contains(F.col("a_arr"), x)
                & F.array_contains(F.col("b_arr"), x),
            )
        ),
    ).withColumn("est_union", kmv_estimate(F.col("u_arr"), k))
    return row.select(
        F.lit(k).cast("bigint").alias("k"),
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersect",
        kmv_estimate(F.col("a_arr"), k).alias("est_a"),
        kmv_estimate(F.col("b_arr"), k).alias("est_b"),
        F.col("est_union"),
        F.when(
            F.size(F.col("u_arr")) < k, F.col("n_both").cast("double")
        )
        .otherwise(
            (F.col("n_both").cast("double") / F.lit(float(k)))
            * F.col("est_union")
        )
        .alias("est_intersect"),
    )


_QSK = 256  # bottom-k sample size
_QSK_SALT = 32
_QSK_QS = [0.25, 0.5, 0.75, 0.9]
# DKW(delta=0.05): sup-norm rank error of a k-point empirical CDF.
# Precomputed literal (not ln() in-plan: catalog cross-engine ln ban).
_QSK_EPS = 0.08489483413453501  # sqrt(ln(2/0.05) / (2*256))


@register(
    "sketch_bottomk_quantiles",
    f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
               AS h,
             value
      FROM events
    ), kept AS (
      SELECT h, value FROM (
        SELECT h, value, ROW_NUMBER() OVER (ORDER BY h, value) AS rn FROM h
      ) WHERE rn <= {_QSK}
    ), sorted AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, h) AS sr,
             COUNT(*) OVER () AS ks
      FROM kept
    ), est AS (
      SELECT CAST(qq.q AS DOUBLE) AS quantile, s.value AS est_value,
             CAST(s.ks AS BIGINT) AS k_sample
      FROM (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS q) qq
      JOIN sorted s
        ON s.sr = CAST(CEIL(CAST(qq.q AS DOUBLE) * s.ks) AS BIGINT)
    ), ranks AS (
      SELECT e.quantile, e.k_sample, e.est_value,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN ev.value < e.est_value THEN 1 ELSE 0 END)
                  AS BIGINT) AS rank_lt,
             CAST(SUM(CASE WHEN ev.value <= e.est_value THEN 1 ELSE 0 END)
                  AS BIGINT) AS rank_le
      FROM est e CROSS JOIN events ev
      GROUP BY 1, 2, 3
    )
    SELECT quantile, k_sample, est_value, n_rows, rank_lt, rank_le,
           GREATEST(ABS(CAST(rank_lt AS DOUBLE) / n_rows - quantile),
                    ABS(CAST(rank_le AS DOUBLE) / n_rows - quantile))
             AS rank_err,
           CAST({_QSK_EPS!r} AS DOUBLE) AS dkw_eps,
           GREATEST(ABS(CAST(rank_lt AS DOUBLE) / n_rows - quantile),
                    ABS(CAST(rank_le AS DOUBLE) / n_rows - quantile))
             <= CAST({_QSK_EPS!r} AS DOUBLE) AS within_dkw
    FROM ranks
    """,
    doc="Mergeable QUANTILE sketch via a deterministic bottom-k uniform "
        "row sample (the KMV idea pointed at VALUES instead of distinct "
        "counts): keep the k=256 rows whose portable 60-bit key hash is "
        "smallest — a true uniform sample because the hash order is "
        "independent of value, and mergeable because bottom-k of a union "
        "= bottom-k of the per-partition bottom-ks (property-tested).  "
        "Estimate q = the ceil(q*k)-th smallest sampled value; the row "
        "then certifies the ESTIMATOR'S ERROR exactly — the estimate's "
        "true rank interval [rank_lt, rank_le] over the full table and "
        "its sup-norm deviation against the precomputed DKW(0.05) bound "
        "sqrt(ln(2/d)/2k).  Scale shape: salt-bucketed rank (no "
        "single-reducer sort), 32 bucket arrays folded in ONE bounded "
        "global aggregate, and the exact-rank pass is a 4-row broadcast "
        "cross + one conditional aggregation — quantile_exact_scalable "
        "pays a full range-decomposed global sort for exactness; this "
        "row answers the same question at a fixed tiny state size, the "
        "trade a 100 TB profiler actually takes",
)
def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from bakery_big_data_spark.operators.sketches import kmv_hash60

    ev = t(spark, sf_dir, "events").select("event_id", "value")
    h = ev.select(
        kmv_hash60(F.col("event_id").cast("string")).alias("h"), "value"
    )
    w1 = Window.partitionBy(F.pmod(F.col("h"), F.lit(_QSK_SALT))).orderBy(
        "h", "value"
    )
    surv = (
        h.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= _QSK)
        .drop("_rn")
    )
    per_bucket = surv.groupBy(
        F.pmod(F.col("h"), F.lit(_QSK_SALT)).alias("b")
    ).agg(F.collect_list(F.struct("h", "value")).alias("arr"))
    merged = per_bucket.agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("arr"))), 1, _QSK
        ).alias("samp")
    )
    by_value = merged.select(
        F.array_sort(
            F.transform(
                "samp",
                lambda s: F.struct(s["value"].alias("v"), s["h"].alias("h")),
            )
        ).alias("sv"),
        F.size("samp").cast("bigint").alias("k_sample"),
    )
    est = by_value.select(
        F.explode(
            F.array(*[F.lit(q).cast("double") for q in _QSK_QS])
        ).alias("quantile"),
        "sv",
        "k_sample",
    ).select(
        "quantile",
        "k_sample",
        F.element_at(
            "sv",
            F.ceil(F.col("quantile") * F.col("k_sample")).cast("int"),
        )["v"].alias("est_value"),
    )
    ranks = (
        t(spark, sf_dir, "events")
        .select("value")
        .crossJoin(F.broadcast(est))
        .groupBy("quantile", "k_sample", "est_value")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("value") < F.col("est_value"), 1).otherwise(0)
            ).alias("rank_lt"),
            F.sum(
                F.when(F.col("value") <= F.col("est_value"), 1).otherwise(0)
            ).alias("rank_le"),
        )
    )
    err = F.greatest(
        F.abs(F.col("rank_lt").cast("double") / F.col("n_rows") - F.col("quantile")),
        F.abs(F.col("rank_le").cast("double") / F.col("n_rows") - F.col("quantile")),
    )
    return ranks.select(
        "quantile",
        "k_sample",
        "est_value",
        "n_rows",
        "rank_lt",
        "rank_le",
        err.alias("rank_err"),
        F.lit(_QSK_EPS).cast("double").alias("dkw_eps"),
        (err <= F.lit(_QSK_EPS).cast("double")).alias("within_dkw"),
    )


_MB_MIN_SUPPORT = 3


@register(
    "market_basket_rules",
    f"""
    WITH pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM pp
    ), item AS (
      SELECT l_partkey, COUNT(*) AS s FROM pp GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MB_MIN_SUPPORT}
    )
    SELECT p.part_a, p.part_b, p.support,
           ia.s AS n_a, ib.s AS n_b,
           CAST(p.support AS DOUBLE) / CAST(ia.s AS DOUBLE) AS conf_a_b,
           CAST(p.support AS DOUBLE) / CAST(ib.s AS DOUBLE) AS conf_b_a,
           (CAST(p.support AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(ia.s AS DOUBLE) * CAST(ib.s AS DOUBLE)) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n
    """,
    doc="Association-rule mining (market basket) over order contents: "
        "part pairs co-ordered in >= 3 baskets with support, both "
        "directed confidences, and lift — the recommendation primitive "
        "next to the co-purchase graph rows (triangles count structure; "
        "this row quantifies rule strength).  Scale shape: candidate "
        "pairs come from the per-basket self-join (O(Σ basket²), the "
        "A-priori candidate step — never part×part), item supports are "
        "one hash agg joined back on the part key, and the basket "
        "count is a lazy 1-row broadcast; every per-row ratio is a "
        "single IEEE divide on exact BIGINT counts, so the hash "
        "certifies the statistics bit-for-bit",
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The basket projection still feeds the two item-support legs and the
    # order count as independent columnar scans (measured at x10, r12
    # adjudication: a localCheckpoint of the ~6M-row distinct costs 2.4x
    # the whole-stage-codegen parquet passes it saves).  The PAIR leg —
    # the expensive per-basket self-join — is the shared materialized
    # co-purchase support frame the triangle rows also consume (one
    # build per session/sf instead of two; guide §1.2): identical join,
    # identical groupBy counts.
    from bakery_big_data_spark.plans.graph import _copurchase_support

    pp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = pp.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = pp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    pair = (
        _copurchase_support(spark, sf_dir)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            "support",
        )
        .filter(F.col("support") >= _MB_MIN_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("ka"), F.col("s").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("kb"), F.col("s").alias("n_b")
    )
    out = (
        pair.join(ia, F.col("part_a") == F.col("ka"))
        .join(ib, F.col("part_b") == F.col("kb"))
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "part_a",
        "part_b",
        "support",
        "n_a",
        "n_b",
        (F.col("support").cast("double") / F.col("n_a").cast("double")).alias(
            "conf_a_b"
        ),
        (F.col("support").cast("double") / F.col("n_b").cast("double")).alias(
            "conf_b_a"
        ),
        (
            (F.col("support").cast("double") * F.col("n_orders").cast("double"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )


_GD_ROUNDS = 8
_GD_LR = 0.1


def _gd_oracle(rounds: int, lr: float) -> str:
    """Unrolled gradient-descent oracle on the sufficient-statistic row:
    per-magnitude floor quantizers keep every sum an exact int64 (q/d at
    1e9, y at 1e4, squares at 1e8/1e9/1e1, standardized moments at 1e9 —
    int64→double conversion is a correctly-rounded hardware op in both
    engines, unlike int128), so each round is pure IEEE arithmetic on
    identical scalars."""
    head = """
    WITH raw AS MATERIALIZED (
      SELECT CAST(l_extendedprice AS DOUBLE) AS q,
             CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE)
               AS d,
             CAST(l_extendedprice AS DOUBLE)
               * (1.0 - CAST(l_discount AS DOUBLE)) AS y
      FROM lineitem
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(q * 1e4) AS BIGINT)) AS DOUBLE) / 1e4 AS sq,
             CAST(SUM(CAST(FLOOR(d * 1e4) AS BIGINT)) AS DOUBLE) / 1e4 AS sd,
             CAST(SUM(CAST(FLOOR(y * 1e4) AS BIGINT)) AS DOUBLE) / 1e4 AS sy,
             CAST(SUM(CAST(FLOOR(q * q * 1e1) AS BIGINT)) AS DOUBLE) / 1e1
               AS sq2,
             CAST(SUM(CAST(FLOOR(d * d * 1e3) AS BIGINT)) AS DOUBLE) / 1e3
               AS sd2,
             CAST(SUM(CAST(FLOOR(y * y * 1e1) AS BIGINT)) AS DOUBLE) / 1e1
               AS sy2
      FROM raw
    ), mus AS (
      SELECT n, sq / n AS mq, sd / n AS md, sy / n AS my,
             sqrt(sq2 / n - (sq / n) * (sq / n)) AS vq,
             sqrt(sd2 / n - (sd / n) * (sd / n)) AS vd,
             sqrt(sy2 / n - (sy / n) * (sy / n)) AS vy
      FROM stats
    ), xs AS MATERIALIZED (
      SELECT (q - mq) / vq AS x1, (d - md) / vd AS x2,
             (y - my) / vy AS ys
      FROM raw, mus
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(x1 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s1,
             CAST(SUM(CAST(FLOOR(x2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s2,
             CAST(SUM(CAST(FLOOR(x1 * x1 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s11,
             CAST(SUM(CAST(FLOOR(x1 * x2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s12,
             CAST(SUM(CAST(FLOOR(x2 * x2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s22,
             CAST(SUM(CAST(FLOOR(ys * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS b0,
             CAST(SUM(CAST(FLOOR(x1 * ys * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS b1,
             CAST(SUM(CAST(FLOOR(x2 * ys * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS b2,
             CAST(SUM(CAST(FLOOR(ys * ys * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS syy
      FROM xs
    ), r0 AS (
      SELECT n, s1 / n AS a1, s2 / n AS a2, s11 / n AS a11, s12 / n AS a12,
             s22 / n AS a22, b0 / n AS c0, b1 / n AS c1, b2 / n AS c2,
             syy / n AS cyy,
             0.0 AS w0, 0.0 AS w1, 0.0 AS w2
      FROM mom
    )"""
    rounds_sql = []
    for i in range(1, rounds + 1):
        rounds_sql.append(
            f""", r{i} AS (
      SELECT n, a1, a2, a11, a12, a22, c0, c1, c2, cyy,
             w0 - {lr!r} * ((w0 + a1 * w1 + a2 * w2) - c0) AS w0,
             w1 - {lr!r} * ((a1 * w0 + a11 * w1 + a12 * w2) - c1) AS w1,
             w2 - {lr!r} * ((a2 * w0 + a12 * w1 + a22 * w2) - c2) AS w2
      FROM r{i - 1}
    )"""
        )
    tail = f"""
    SELECT CAST(n AS BIGINT) AS n_rows, w0, w1, w2,
           (w0 * w0 + a11 * w1 * w1 + a22 * w2 * w2
            + 2 * (a1 * w0 * w1 + a2 * w0 * w2 + a12 * w1 * w2))
           - 2 * (c0 * w0 + c1 * w1 + c2 * w2) + cyy AS mse
    FROM r{rounds}
    """
    return head + "".join(rounds_sql) + tail


@register(
    "ml_linear_regression_gd",
    _gd_oracle(_GD_ROUNDS, _GD_LR),
    doc="Distributed LINEAR-MODEL TRAINING, hash-certified end to end: "
        "standardized OLS on lineitem (net revenue price*(1-disc) ~ "
        "gross price + absolute discount — an exact linear ground "
        "truth y = x1 - x2, so the fit is verifiable: MSE must fall "
        "from 1.0 toward 0 and does) by batch gradient descent — but run on SUFFICIENT "
        "STATISTICS: the gradient of squared loss is (X'X)w - X'y, so "
        "ONE corpus pass aggregates the 3x3 moment matrix and moment "
        "vector (map-side combinable), and every GD round after that is "
        "a handful of scalar IEEE ops on a 1-row frame — per-round cost "
        "independent of corpus size, the shape that makes iterative "
        "training tractable at 100 TB (contrast: naive GD re-scans the "
        "corpus every round).  Numeric discipline: per-magnitude floor "
        "quantizers keep every sum an exact int64 whose double "
        "conversion is a correctly-rounded hardware op in both engines "
        "(1e12-style quantizers would overflow int64 on the squares at "
        "bench scale); the oracle unrolls all rounds as CTEs, so the "
        "trained weights AND the closed-form standardized MSE are "
        "bit-identical.  Fixed rounds + zero init pin determinism (the "
        "PageRank/PCA training-step contract)",
)
def ml_linear_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ep = F.col("l_extendedprice").cast("double")
    disc = F.col("l_discount").cast("double")
    li = t(spark, sf_dir, "lineitem").select(
        ep.alias("q"),
        (ep * disc).alias("d"),
        (ep * (F.lit(1.0) - disc)).alias("y"),
    )

    def qs(col, scale):
        return F.sum(F.floor(col * F.lit(scale)).cast("bigint")).cast(
            "double"
        ) / F.lit(scale)

    stats = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        qs(F.col("q"), 1e4).alias("sq"),
        qs(F.col("d"), 1e4).alias("sd"),
        qs(F.col("y"), 1e4).alias("sy"),
        qs(F.col("q") * F.col("q"), 1e1).alias("sq2"),
        qs(F.col("d") * F.col("d"), 1e3).alias("sd2"),
        qs(F.col("y") * F.col("y"), 1e1).alias("sy2"),
    ).select(
        "n",
        (F.col("sq") / F.col("n")).alias("mq"),
        (F.col("sd") / F.col("n")).alias("md"),
        (F.col("sy") / F.col("n")).alias("my"),
        F.sqrt(
            F.col("sq2") / F.col("n")
            - (F.col("sq") / F.col("n")) * (F.col("sq") / F.col("n"))
        ).alias("vq"),
        F.sqrt(
            F.col("sd2") / F.col("n")
            - (F.col("sd") / F.col("n")) * (F.col("sd") / F.col("n"))
        ).alias("vd"),
        F.sqrt(
            F.col("sy2") / F.col("n")
            - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("vy"),
    )
    xs = li.crossJoin(F.broadcast(stats)).select(
        ((F.col("q") - F.col("mq")) / F.col("vq")).alias("x1"),
        ((F.col("d") - F.col("md")) / F.col("vd")).alias("x2"),
        ((F.col("y") - F.col("my")) / F.col("vy")).alias("ys"),
    )
    mom = xs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        qs(F.col("x1"), 1e9).alias("s1"),
        qs(F.col("x2"), 1e9).alias("s2"),
        qs(F.col("x1") * F.col("x1"), 1e9).alias("s11"),
        qs(F.col("x1") * F.col("x2"), 1e9).alias("s12"),
        qs(F.col("x2") * F.col("x2"), 1e9).alias("s22"),
        qs(F.col("ys"), 1e9).alias("b0"),
        qs(F.col("x1") * F.col("ys"), 1e9).alias("b1"),
        qs(F.col("x2") * F.col("ys"), 1e9).alias("b2"),
        qs(F.col("ys") * F.col("ys"), 1e9).alias("syy"),
    )
    r = mom.select(
        "n",
        (F.col("s1") / F.col("n")).alias("a1"),
        (F.col("s2") / F.col("n")).alias("a2"),
        (F.col("s11") / F.col("n")).alias("a11"),
        (F.col("s12") / F.col("n")).alias("a12"),
        (F.col("s22") / F.col("n")).alias("a22"),
        (F.col("b0") / F.col("n")).alias("c0"),
        (F.col("b1") / F.col("n")).alias("c1"),
        (F.col("b2") / F.col("n")).alias("c2"),
        (F.col("syy") / F.col("n")).alias("cyy"),
        F.lit(0.0).alias("w0"),
        F.lit(0.0).alias("w1"),
        F.lit(0.0).alias("w2"),
    )
    lr = F.lit(_GD_LR)
    for _ in range(_GD_ROUNDS):
        g0 = (F.col("w0") + F.col("a1") * F.col("w1") + F.col("a2") * F.col("w2")) - F.col("c0")
        g1 = (
            F.col("a1") * F.col("w0")
            + F.col("a11") * F.col("w1")
            + F.col("a12") * F.col("w2")
        ) - F.col("c1")
        g2 = (
            F.col("a2") * F.col("w0")
            + F.col("a12") * F.col("w1")
            + F.col("a22") * F.col("w2")
        ) - F.col("c2")
        r = r.select(
            "n", "a1", "a2", "a11", "a12", "a22", "c0", "c1", "c2", "cyy",
            (F.col("w0") - lr * g0).alias("w0"),
            (F.col("w1") - lr * g1).alias("w1"),
            (F.col("w2") - lr * g2).alias("w2"),
        )
    mse = (
        F.col("w0") * F.col("w0")
        + F.col("a11") * F.col("w1") * F.col("w1")
        + F.col("a22") * F.col("w2") * F.col("w2")
        + F.lit(2.0)
        * (
            F.col("a1") * F.col("w0") * F.col("w1")
            + F.col("a2") * F.col("w0") * F.col("w2")
            + F.col("a12") * F.col("w1") * F.col("w2")
        )
    ) - F.lit(2.0) * (
        F.col("c0") * F.col("w0")
        + F.col("c1") * F.col("w1")
        + F.col("c2") * F.col("w2")
    ) + F.col("cyy")
    return r.select(
        F.col("n").cast("bigint").alias("n_rows"),
        "w0",
        "w1",
        "w2",
        mse.alias("mse"),
    )


_JS_DEPTH = 4
_JS_WIDTH = 512


@register(
    "sketch_cms_selfjoin_size",
    f"""
    WITH keyed AS (
      SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM keyed
    ), freq AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS f FROM keyed GROUP BY k
    ), exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(f * f) AS BIGINT) AS exact_f2
      FROM freq
    ), hashed AS (
      SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT & 2147483647 AS h
      FROM keyed
    ), cells AS (
      SELECT t.i AS row,
             (({_cms_case([1, 1566083941, 998244353, 1103515245])} * h
               + {_cms_case([0, 97531, 12345, 424243])})
              % 2147483647) % {_JS_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hashed, unnest(range(0, {_JS_DEPTH})) AS t(i)
      GROUP BY 1, 2
    ), per_row AS (
      SELECT row, CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      FROM cells GROUP BY row
    ), est AS (
      SELECT CAST(MIN(s2) AS BIGINT) AS est_f2 FROM per_row
    )
    SELECT n.n_rows, exact.n_keys, exact.exact_f2, est.est_f2,
           est.est_f2 >= exact.exact_f2 AS is_upper_bounded_below,
           CAST(est.est_f2 - exact.exact_f2 AS DOUBLE)
             / (CAST(n.n_rows AS DOUBLE) * CAST(n.n_rows AS DOUBLE)
                / {_JS_WIDTH}.0) AS excess_vs_bound_unit
    FROM n, exact, est
    """,
    doc="JOIN-SIZE ESTIMATION from sketches — the query-optimizer "
        "statistic (AMS/CMS inner product): the self-join cardinality "
        "on l_partkey (the second frequency moment F2 = Σf(k)², i.e. "
        "the row count of lineitem⋈lineitem on the key — and the "
        "denominator of HHI, complementing skew_profile_keys) estimated "
        "as min over sketch rows of Σ_w cell², from the SAME portable "
        "Carter-Wegman 4x512 Count-Min grid as the heavy-hitters row — "
        "mergeable, fixed {d}x{w} state, one map-side-combinable "
        "aggregation; never a join, never a per-key rollup at probe "
        "time.  Estimator guarantees certified ON the row: "
        "est ≥ exact always (collisions only add), and the excess is "
        "reported in units of the CMS bound N²/width.  Exact F2 rides "
        "along from one per-key rollup; all integer arithmetic — "
        "hash-exact with zero float hazards",
)
def sketch_cms_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import count_min_build

    keyed = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    # ONE corpus pass: the per-key rollup feeds BOTH the exact moments
    # (n_rows = SUM(f) — no separate count-the-table scan) and the
    # weighted sketch build (bit-identical counters; the raw-stream build
    # was a second full scan exploding |lineitem|x4 rows where this
    # explodes |distinct keys|x4).  Persisted because it has two
    # consumers; |distinct l_partkey| rows only.
    freq = _EXT_CACHE.get_or_build(
        spark,
        (sf_dir, "cms_lpartkey_freq"),
        lambda: keyed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist(),
    )
    exact = freq.agg(
        F.sum("f").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("f") * F.col("f")).alias("exact_f2"),
    )
    cells = count_min_build(
        freq, "k", depth=_JS_DEPTH, width=_JS_WIDTH, weight_col="f"
    )
    est = (
        cells.groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("s2"))
        .agg(F.min("s2").alias("est_f2"))
    )
    out = exact.crossJoin(F.broadcast(est))
    nd = F.col("n_rows").cast("double")
    return out.select(
        "n_rows",
        "n_keys",
        "exact_f2",
        "est_f2",
        (F.col("est_f2") >= F.col("exact_f2")).alias(
            "is_upper_bounded_below"
        ),
        (
            (F.col("est_f2") - F.col("exact_f2")).cast("double")
            / (nd * nd / F.lit(float(_JS_WIDTH)))
        ).alias("excess_vs_bound_unit"),
    )


@register(
    "sketch_cms_join_size_estimate",
    f"""
    WITH h1 AS (
      SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
               & 2147483647 AS h
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-07-01'
    ), h2 AS (
      SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
               & 2147483647 AS h
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-07-01'
    ), c1 AS (
      SELECT t.i AS row,
             (({_cms_case([1, 1566083941, 998244353, 1103515245])} * h
               + {_cms_case([0, 97531, 12345, 424243])})
              % 2147483647) % {_JS_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM h1, unnest(range(0, {_JS_DEPTH})) AS t(i) GROUP BY 1, 2
    ), c2 AS (
      SELECT t.i AS row,
             (({_cms_case([1, 1566083941, 998244353, 1103515245])} * h
               + {_cms_case([0, 97531, 12345, 424243])})
              % 2147483647) % {_JS_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM h2, unnest(range(0, {_JS_DEPTH})) AS t(i) GROUP BY 1, 2
    ), per_row AS (
      SELECT c1.row, CAST(SUM(c1.cnt * c2.cnt) AS BIGINT) AS ip
      FROM c1 JOIN c2 ON c1.row = c2.row AND c1.bucket = c2.bucket
      GROUP BY c1.row
    ), est AS (
      SELECT CAST(MIN(ip) AS BIGINT) AS est_join FROM per_row
    ), sizes AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM h1) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM h2) AS n2
    ), exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_join
      FROM (SELECT l_partkey FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-07-01') a
      JOIN (SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-07-01') b
        ON a.l_partkey = b.l_partkey
    )
    SELECT s.n1, s.n2, exact.exact_join, est.est_join,
           est.est_join >= exact.exact_join AS is_bounded_below,
           CAST(est.est_join - exact.exact_join AS DOUBLE)
             / (CAST(s.n1 AS DOUBLE) * CAST(s.n2 AS DOUBLE)
                / {_JS_WIDTH}.0) AS excess_vs_bound_unit
    FROM sizes s, exact, est
    """,
    doc="PRE-FLIGHT join-size prediction for a PLANNED join — the "
        "two-stream CMS inner product (the optimizer statistic behind "
        "broadcast-vs-shuffle and skew decisions): H1-half-year and "
        "H2-half-year lineitems each build the portable 4x512 Count-Min "
        "grid independently (one map-side-combinable agg per stream, "
        "mergeable, fixed state), and the join cardinality on l_partkey "
        "is estimated as min over rows of the cellwise inner product — "
        "WITHOUT executing the join.  The exact join count rides along "
        "to certify the classic guarantee on-row: est >= exact always "
        "(collisions only add) and the excess is reported in N1*N2/width "
        "bound units.  At 100 TB the sketches are table-statistics you "
        "keep per partition and merge; the estimate costs two scans "
        "and a 2048-cell join, never a shuffle of either side.  "
        "All-integer arithmetic — zero float hazards",
)
def sketch_cms_join_size_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import count_min_build

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k"), "l_shipdate"
    )
    cut = F.lit("1998-07-01").cast("timestamp")
    # ONE corpus pass: per-key (f1, f2) half-frequencies in a single
    # rollup.  Everything downstream is arithmetic on this |distinct
    # keys|-row frame — the sizes are column sums, the EXACT join count
    # is SUM(f1*f2) (each key contributes f1·f2 matched pairs; the old
    # form physically materialized those pairs in an equi-join, ~n²/keys
    # rows, just to count them), and the two sketches build weighted
    # (bit-identical counters to the per-occurrence builds).  Was: five
    # lineitem scans + a pair-materializing shuffle join.
    fr = _EXT_CACHE.get_or_build(
        spark,
        (sf_dir, "cms_js_freq"),
        lambda: li.groupBy("k")
        .agg(
            F.count_if(F.col("l_shipdate") < cut).alias("f1"),
            F.count_if(F.col("l_shipdate") >= cut).alias("f2"),
        )
        .persist(),
    )
    c1 = count_min_build(
        fr.filter(F.col("f1") > 0).select("k", "f1"),
        "k",
        depth=_JS_DEPTH,
        width=_JS_WIDTH,
        weight_col="f1",
    )
    c2 = count_min_build(
        fr.filter(F.col("f2") > 0).select("k", "f2"),
        "k",
        depth=_JS_DEPTH,
        width=_JS_WIDTH,
        weight_col="f2",
    ).select(
        F.col("row").alias("row2"),
        F.col("bucket").alias("bucket2"),
        F.col("cnt").alias("cnt2"),
    )
    est = (
        c1.join(
            c2,
            (F.col("row") == F.col("row2"))
            & (F.col("bucket") == F.col("bucket2")),
        )
        .groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt2")).alias("ip"))
        .agg(F.min("ip").alias("est_join"))
    )
    sizes = fr.agg(
        F.sum("f1").alias("n1"),
        F.sum("f2").alias("n2"),
        F.sum(F.col("f1") * F.col("f2")).alias("exact_join"),
    )
    out = sizes.crossJoin(F.broadcast(est))
    return out.select(
        "n1",
        "n2",
        "exact_join",
        "est_join",
        (F.col("est_join") >= F.col("exact_join")).alias("is_bounded_below"),
        (
            (F.col("est_join") - F.col("exact_join")).cast("double")
            / (
                F.col("n1").cast("double")
                * F.col("n2").cast("double")
                / F.lit(float(_JS_WIDTH))
            )
        ).alias("excess_vs_bound_unit"),
    )


_RI_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _ri_oracle() -> str:
    parts = []
    for name, child, fk, parent, pk in _RI_EDGES:
        parts.append(
            f"""
    SELECT '{name}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT)
             AS n_orphans,
           CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL) AS DOUBLE)
             / COUNT(*) AS orphan_rate
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        )
    return " UNION ALL ".join(parts)


@register(
    "audit_referential_integrity",
    _ri_oracle(),
    doc="Referential-integrity AUDIT across every foreign-key edge of "
        "the warehouse schema — the pre-publication data-quality gate a "
        "medallion silver layer runs before promoting to gold: one row "
        "per FK edge with child cardinality, orphan count (children "
        "whose parent key has no match), and orphan rate, via LEFT "
        "anti-pattern joins (Catalyst broadcasts the dim parents; the "
        "fact-fact edges shuffle on the key like any equi-join).  "
        "Complements the column-rule quality engine (§2.11), which "
        "validates rows in isolation — this validates the RELATIONSHIPS "
        "between tables.  Exact integer counts, one IEEE divide",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 note: a one-fact-scan consolidation of the three lineitem edges
    # (explode to (edge_idx, fk) + single mixed-key aggregate) was
    # implemented, oracle-verified and then REVERTED on measurement: with
    # parquet column pruning the three per-edge scans each read a
    # DISJOINT single key column (same total bytes as one 3-column scan),
    # while the explode tripled the aggregate's input rows — ×10-corpus
    # A/B 3.48 s → 4.13 s.  The per-edge pre-aggregation below (batch 2)
    # remains the scale-relevant fix.
    out = None
    for name, child, fk, parent, pk in _RI_EDGES:
        # Pre-aggregate the child side to (fk, f) BEFORE the parent join
        # (guide §2.3 "aggregate before you shuffle"): the join then
        # carries |distinct fk| rows instead of |child| rows — at 100 TB
        # the fact-fact edges (lineitem->orders) stop shuffling the whole
        # fact table just to count orphans.  n_child_rows = SUM(f) and
        # n_orphans = SUM(f) over unmatched keys: identical integers
        # (every child row of one fk value shares one match verdict).
        c = (
            t(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("_fk"))
            .agg(F.count(F.lit(1)).alias("_f"))
        )
        p = t(spark, sf_dir, parent).select(F.col(pk).alias("_pk"))
        joined = c.join(p, F.col("_fk") == F.col("_pk"), "left")
        row = joined.agg(
            F.sum("_f").alias("n_child_rows"),
            # otherwise(0) so an orphan-free edge sums to 0, not NULL —
            # count_if's behavior in the pre-rollup form
            F.sum(
                F.when(F.col("_pk").isNull(), F.col("_f")).otherwise(0)
            ).alias("n_orphans"),
        ).select(
            F.lit(name).alias("fk_edge"),
            "n_child_rows",
            "n_orphans",
            (
                F.col("n_orphans").cast("double") / F.col("n_child_rows")
            ).alias("orphan_rate"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_MG_K = 32
_MG_KEY_SQL = (
    "CASE WHEN value < 50 THEN event_type "
    "ELSE event_type || ':' || CAST(user_id AS VARCHAR) END"
)


@register(
    "sketch_misra_gries_heavy_hitters",
    f"""
    WITH keyed AS (
      SELECT {_MG_KEY_SQL} AS g FROM events
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM keyed
    ), f AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM keyed GROUP BY g
      ORDER BY true_count DESC, g LIMIT 20
    )
    SELECT g AS key, true_count,
           true_count * {_MG_K + 1} > n_tot AS guaranteed_heavy,
           TRUE AS est_lower_ok,
           TRUE AS bound_ok,
           TRUE AS covered_ok
    FROM f, n
    """,
    doc="Misra-Gries heavy hitters (Misra & Gries 1982; mergeable per "
        "Agarwal et al. 2013) — the DETERMINISTIC counter-based "
        "complement to the probabilistic Count-Min row: k=32 counters, "
        "worst-case contract est<=true AND true-est<=N/(k+1) for EVERY "
        "key (absent keys read 0), so every key above N/(k+1) is "
        "guaranteed present — no hash functions, no failure "
        "probability.  The stream is the sentinel-collapse key real "
        "frequency tables are dominated by (low-value events collapse "
        "to their event_type, like empty referrers collapsing to "
        "'direct'): 5 collapsed keys at ~12% of N each tower over "
        "~750 per-user tail keys, so the guarantee is exercised, not "
        "vacuous.  The summary content is partitioning-dependent "
        "(WHICH tail keys survive varies) but the CONTRACT is not, so "
        "the row certifies exactly the deterministic facts: the exact "
        "top-20 keys with per-key booleans computed from the real "
        "summary — est_lower_ok, bound_ok via exact integer cross- "
        "multiplication (true-est)*(k+1) <= N, covered_ok = "
        "guaranteed implies present.  A flipped boolean hash-fails "
        "against the oracle's TRUE literals.  Plan shape: bounded "
        "8k-entry Arrow fold per partition emitting <=k rows, key-sum "
        "merge, one take-ordered over the <=k*P partial frame "
        "(operators/sketches.py::misra_gries_summary)",
)
def sketch_misra_gries_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bakery_big_data_spark.operators.sketches import misra_gries_summary
    from bakery_big_data_spark.plans.base import spread

    k = _MG_K
    keyed = spread(
        t(spark, sf_dir, "events").select(
            F.when(F.col("value") < 50, F.col("event_type"))
            .otherwise(
                F.concat_ws(
                    ":", F.col("event_type"), F.col("user_id").cast("string")
                )
            )
            .alias("g")
        )
    )
    keyed = _EXT_CACHE.get_or_build(
        spark, (sf_dir, "mg_keyed"), lambda: keyed.persist()
    )
    n_row = keyed.agg(F.count(F.lit(1)).alias("n_tot"))
    summary = misra_gries_summary(keyed, "g", k).withColumnRenamed(
        "cnt", "est"
    )
    exact = (
        keyed.groupBy("g")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), "g")
        .limit(20)
    )
    est0 = F.coalesce(F.col("est"), F.lit(0))
    guaranteed = F.col("true_count") * F.lit(k + 1) > F.col("n_tot")
    return (
        exact.join(summary, "g", "left")
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("g").alias("key"),
            "true_count",
            guaranteed.alias("guaranteed_heavy"),
            (est0 <= F.col("true_count")).alias("est_lower_ok"),
            (
                (F.col("true_count") - est0) * F.lit(k + 1)
                <= F.col("n_tot")
            ).alias("bound_ok"),
            (~guaranteed | (est0 > F.lit(0))).alias("covered_ok"),
        )
    )


_LOGIT_ROUNDS = 8
_LOGIT_LR = 4.0


def _logit_cte_chain(rounds: int, lr: float) -> str:
    """Unrolled per-round-corpus-pass GD CTE chain (through ``r{rounds}``)
    for the logistic rows.

    Non-quadratic loss means NO sufficient-statistic shortcut exists (the
    gradient needs sigma(x'w) per row), so — unlike the linear-GD row —
    every round is a genuine corpus pass, here an ``xs, r{i-1}`` CTE
    scan.  The link is the algebraic fast sigmoid
    ``0.5 + 0.5*(z/(1+|z|))``: +, *, /, abs are single correctly-rounded
    IEEE ops in both engines (exp is NOT guaranteed bit-identical, which
    rules the classic logistic link out of hash certification), so every
    per-row addend is bit-identical and the 1e9 floor quantizers make
    each round's gradient sums exact int64s.  Shared by the training row
    (weights/accuracy tail) and the calibration row (reliability tail)."""
    head = """
    WITH labeled AS MATERIALIZED (
      SELECT q, d, CASE WHEN d < 0.05 * q THEN 1.0 ELSE 0.0 END AS y
      FROM (
        SELECT CAST(l_extendedprice AS DOUBLE) AS q,
               CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE)
                 AS d
        FROM lineitem
      )
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(q * 1e4) AS BIGINT)) AS DOUBLE) / 1e4 AS sq,
             CAST(SUM(CAST(FLOOR(d * 1e4) AS BIGINT)) AS DOUBLE) / 1e4 AS sd,
             CAST(SUM(CAST(FLOOR(q * q * 1e1) AS BIGINT)) AS DOUBLE) / 1e1
               AS sq2,
             CAST(SUM(CAST(FLOOR(d * d * 1e3) AS BIGINT)) AS DOUBLE) / 1e3
               AS sd2
      FROM labeled
    ), mus AS (
      SELECT n, sqrt(sq2 / n - (sq / n) * (sq / n)) AS vq,
             sqrt(sd2 / n - (sd / n) * (sd / n)) AS vd,
             sq / n AS mq, sd / n AS md
      FROM stats
    ), xs AS MATERIALIZED (
      SELECT (q - mq) / vq AS x1, (d - md) / vd AS x2, y
      FROM labeled, mus
    ), r0 AS (
      SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2
    )"""
    rounds_sql = []
    for i in range(1, rounds + 1):
        rounds_sql.append(
            f""", p{i} AS MATERIALIZED (
      SELECT x1, x2,
             (0.5 + 0.5 * ((w0 + x1 * w1 + x2 * w2)
               / (1.0 + abs(w0 + x1 * w1 + x2 * w2)))) - y AS e
      FROM xs, r{i - 1}
    ), g{i} AS MATERIALIZED (
      SELECT
        CAST(SUM(CAST(FLOOR(e * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS s0,
        CAST(SUM(CAST(FLOOR(e * x1 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS s1,
        CAST(SUM(CAST(FLOOR(e * x2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS s2
      FROM p{i}
    ), r{i} AS MATERIALIZED (
      SELECT w0 - {lr!r} * (s0 / n) AS w0,
             w1 - {lr!r} * (s1 / n) AS w1,
             w2 - {lr!r} * (s2 / n) AS w2
      FROM r{i - 1}, g{i}, mus
    )"""
        )
    return head + "".join(rounds_sql)


def _logit_oracle(rounds: int, lr: float) -> str:
    return (
        _logit_cte_chain(rounds, lr)
        + f"""
    , acc AS (
      SELECT CAST(SUM(CASE WHEN ((w0 + x1 * w1 + x2 * w2) > 0.0) = (y > 0.5)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM xs, r{rounds}
    )
    SELECT CAST(n AS BIGINT) AS n_rows, w0, w1, w2,
           CAST(n_correct AS DOUBLE) / n AS accuracy,
           CAST(n_correct AS DOUBLE) / n > 0.95 AS separable_fit_ok
    FROM r{rounds}, acc, mus
    """
    )


def _calibration_oracle(rounds: int, lr: float) -> str:
    return (
        _logit_cte_chain(rounds, lr)
        + f"""
    , preds AS (
      SELECT 0.5 + 0.5 * ((w0 + x1 * w1 + x2 * w2)
               / (1.0 + abs(w0 + x1 * w1 + x2 * w2))) AS p, y
      FROM xs, r{rounds}
    ), binned AS (
      SELECT CAST(LEAST(FLOOR(p * 10.0), 9.0) AS BIGINT) AS decile, p, y
      FROM preds
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(SUM(CAST(FLOOR(p * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
             / COUNT(*) AS mean_predicted,
           CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS observed_rate
    FROM binned GROUP BY decile
    """
    )


@register(
    "ml_logistic_classifier_gd",
    _logit_oracle(_LOGIT_ROUNDS, _LOGIT_LR),
    doc="Distributed BINARY-CLASSIFIER training, hash-certified end to "
        "end — the quality-classifier trainer every LLM curation "
        "pipeline runs (fastText-style: label docs, fit a linear "
        "classifier, gate the corpus on its score): logistic-shaped GD "
        "on lineitem with an EXACTLY LINEARLY SEPARABLE ground truth "
        "(y = discount < 5%, i.e. 0.05*gross - absolute_discount > 0, a "
        "linear boundary in the two standardized features), so the fit "
        "is verifiable — accuracy must rise toward the separable "
        "optimum and does (0.96+ after 8 rounds from w=0).  The "
        "CONTRAST with ml_linear_regression_gd is the point: quadratic "
        "loss collapses to sufficient statistics (one corpus pass, then "
        "O(1) rounds), but a non-quadratic link needs sigma(x'w) per "
        "row per round, so each round here is a genuine map-side- "
        "combinable gradient pass over the persisted standardized "
        "corpus — 8 rounds = 8 cached-frame scans, the exact shape "
        "MLlib's LogisticRegression runs at 100 TB.  Cross-engine "
        "determinism: the algebraic fast sigmoid 0.5+0.5*z/(1+|z|) "
        "(exp is not bit-portable; +,*,/,abs are), per-magnitude floor "
        "quantizers for int64-exact gradient sums, weights carried on "
        "a lazy 1-row broadcast frame (no driver round trips), and the "
        "oracle unrolls all 8 rounds as corpus-scanning CTEs — weights, "
        "accuracy, and the certified separable_fit_ok bit identical",
)
def ml_logistic_classifier_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    xs, r = _logit_trained(spark, sf_dir)
    z = F.col("w0") + F.col("x1") * F.col("w1") + F.col("x2") * F.col("w2")
    carry = [F.min(c).alias(f"p{c}") for c in ("n", "w0", "w1", "w2")]
    return (
        xs.crossJoin(F.broadcast(r))
        .agg(
            *carry,
            F.sum(
                F.when((z > F.lit(0.0)) == (F.col("y") > F.lit(0.5)), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            F.col("pn").cast("bigint").alias("n_rows"),
            F.col("pw0").alias("w0"),
            F.col("pw1").alias("w1"),
            F.col("pw2").alias("w2"),
            (F.col("n_correct").cast("double") / F.col("pn")).alias(
                "accuracy"
            ),
            (
                F.col("n_correct").cast("double") / F.col("pn")
                > F.lit(0.95)
            ).alias("separable_fit_ok"),
        )
    )


def _logit_trained(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(persisted standardized corpus ``xs``, trained 1-row weights frame
    ``(n, w0, w1, w2)`` after the 8-round GD loop) — the Spark mirror of
    ``_logit_cte_chain``, shared by the training and calibration rows.

    Both frames are memoized per (session, sf): the weights frame is
    persisted too, so the 8 sequential gradient passes — the only
    non-parallelizable stage — execute once for the first row that acts
    on them and the calibration row pays only its own scoring pass."""
    def build() -> tuple[DataFrame, DataFrame]:
        xs, r = _logit_train(spark, sf_dir)
        return (xs, r.persist())

    return _EXT_CACHE.get_or_build(spark, (sf_dir, "logit_trained"), build)


def _logit_train(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    ep = F.col("l_extendedprice").cast("double")
    disc = F.col("l_discount").cast("double")
    raw = t(spark, sf_dir, "lineitem").select(
        ep.alias("q"), (ep * disc).alias("d")
    )
    labeled = raw.select(
        "q",
        "d",
        F.when(F.col("d") < F.lit(0.05) * F.col("q"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )

    def qs(col, scale):
        return F.sum(F.floor(col * F.lit(scale)).cast("bigint")).cast(
            "double"
        ) / F.lit(scale)

    stats = labeled.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        qs(F.col("q"), 1e4).alias("sq"),
        qs(F.col("d"), 1e4).alias("sd"),
        qs(F.col("q") * F.col("q"), 1e1).alias("sq2"),
        qs(F.col("d") * F.col("d"), 1e3).alias("sd2"),
    )
    mus = stats.select(
        "n",
        F.sqrt(
            F.col("sq2") / F.col("n")
            - (F.col("sq") / F.col("n")) * (F.col("sq") / F.col("n"))
        ).alias("vq"),
        F.sqrt(
            F.col("sd2") / F.col("n")
            - (F.col("sd") / F.col("n")) * (F.col("sd") / F.col("n"))
        ).alias("vd"),
        (F.col("sq") / F.col("n")).alias("mq"),
        (F.col("sd") / F.col("n")).alias("md"),
    )
    xs = (
        labeled.crossJoin(F.broadcast(mus))
        .select(
            ((F.col("q") - F.col("mq")) / F.col("vq")).alias("x1"),
            ((F.col("d") - F.col("md")) / F.col("vd")).alias("x2"),
            "y",
        )
        .persist()
    )
    lr = F.lit(_LOGIT_LR)
    # Weights ride WITH n on one frame, and every round references the
    # previous round's frame exactly ONCE (inside the gradient pass, with
    # the constant n/w columns carried through the aggregate via min) —
    # referencing r twice per round doubles the logical plan per round
    # and analysis alone OOMs by round 8, the same 2^k blowup the BPE
    # merge loop documents (operators/bpe.py).
    r = mus.select(
        "n",
        F.lit(0.0).alias("w0"),
        F.lit(0.0).alias("w1"),
        F.lit(0.0).alias("w2"),
    )
    z = F.col("w0") + F.col("x1") * F.col("w1") + F.col("x2") * F.col("w2")
    e = (
        F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1.0) + F.abs(z)))
    ) - F.col("y")
    carry = [F.min(c).alias(f"p{c}") for c in ("n", "w0", "w1", "w2")]
    for _ in range(_LOGIT_ROUNDS):
        r = (
            xs.crossJoin(F.broadcast(r))
            .agg(
                *carry,
                qs(e, 1e9).alias("s0"),
                qs(e * F.col("x1"), 1e9).alias("s1"),
                qs(e * F.col("x2"), 1e9).alias("s2"),
            )
            .select(
                F.col("pn").alias("n"),
                (F.col("pw0") - lr * (F.col("s0") / F.col("pn"))).alias("w0"),
                (F.col("pw1") - lr * (F.col("s1") / F.col("pn"))).alias("w1"),
                (F.col("pw2") - lr * (F.col("s2") / F.col("pn"))).alias("w2"),
            )
        )
    return xs, r


@register(
    "ml_classifier_calibration",
    _calibration_oracle(_LOGIT_ROUNDS, _LOGIT_LR),
    doc="Model CALIBRATION / reliability table for the trained "
        "classifier — the evaluation half of the quality-classifier "
        "story (a curation gate thresholds on the score, so it needs "
        "the score to MEAN something): the 8-round-GD weights of "
        "ml_logistic_classifier_gd applied back over the corpus, "
        "predictions bucketed into score deciles, and per decile the "
        "row count, positive count, mean predicted probability "
        "(int64-quantized exact sum), and observed positive rate — the "
        "reliability-diagram table.  One extra corpus pass after "
        "training (map-side-combinable decile agg); the oracle re-runs "
        "the full unrolled training chain (shared verbatim via "
        "_logit_cte_chain) plus the binning pass, so weights AND "
        "calibration are certified end to end.  Decile edges are "
        "floor(10p) on bit-identical doubles; the separable ground "
        "truth shows up as the diagnostic pattern a reliability table "
        "exists to reveal: extreme deciles near-pure, mid deciles "
        "mixed",
)
def ml_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    xs, r = _logit_trained(spark, sf_dir)
    z = F.col("w0") + F.col("x1") * F.col("w1") + F.col("x2") * F.col("w2")
    p = F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1.0) + F.abs(z)))
    preds = xs.crossJoin(F.broadcast(r)).select(p.alias("p"), "y")
    binned = preds.select(
        F.least(F.floor(F.col("p") * F.lit(10.0)), F.lit(9.0))
        .cast("bigint")
        .alias("decile"),
        "p",
        "y",
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("y") > F.lit(0.5), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        (
            F.sum(F.floor(F.col("p") * F.lit(1e9)).cast("bigint")).cast(
                "double"
            )
            / F.lit(1e9)
            / F.count(F.lit(1))
        ).alias("mean_predicted"),
        (
            F.sum(F.when(F.col("y") > F.lit(0.5), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("observed_rate"),
    )


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _column_profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS DOUBLE)
             / COUNT(*) AS null_rate,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM events"""
        )
    return " UNION ALL ".join(parts)


@register(
    "audit_column_profile",
    _column_profile_oracle(),
    doc="COLUMN-PROFILE audit (the ANALYZE-TABLE statistics pass every "
        "warehouse runs before query planning and every curation "
        "pipeline runs before trusting a new feed): one row per column "
        "of the events table with row count, NULL count/rate, and "
        "exact distinct cardinality.  Completes the data-quality "
        "triangle — §2.11 validates rows against rules, "
        "audit_referential_integrity validates relationships BETWEEN "
        "tables, this validates the DISTRIBUTION of each column.  Plan "
        "shape: ONE scan — all six null counters and all six "
        "COUNT(DISTINCT)s in a single Aggregate (Catalyst plans the "
        "multi-distinct via Expand, rows x distinct-aggs, still "
        "map-side partial and one shuffle — the standard engine shape "
        "for ANALYZE; per-column passes would scan the table 6x), then "
        "a stack() unpivot of the 1-row wide frame into the long "
        "audit format.  At 100 TB swap exact distincts for HLL "
        "(approx_count_distinct_scale certifies the bound) — the plan "
        "shape is identical minus the Expand",
)
def audit_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    wide = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) "
            "AS (column_name, n_null, n_distinct)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        (F.col("n_null").cast("double") / F.col("n_rows")).alias(
            "null_rate"
        ),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


#: Candidate FDs (determinant -> dependent), all on non-null columns so
#: Spark's multi-arg countDistinct (drops any-NULL rows) and DuckDB's
#: COUNT(DISTINCT (a,b)) (counts NULL-bearing row values) cannot diverge.
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderdate", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("customer", "c_custkey", "c_mktsegment"),
]


def _fd_oracle() -> str:
    parts = []
    for tbl, det, dep in _FD_CANDIDATES:
        parts.append(
            f"""
    SELECT '{tbl}.{det} -> {dep}' AS fd,
           CAST(COUNT(DISTINCT {det}) AS BIGINT) AS n_determinants,
           CAST(COUNT(DISTINCT ({det}, {dep})) AS BIGINT) AS n_pairs,
           COUNT(DISTINCT ({det}, {dep})) = COUNT(DISTINCT {det}) AS holds,
           CAST(COUNT(DISTINCT ({det}, {dep})) - COUNT(DISTINCT {det})
                AS BIGINT) AS n_extra_mappings
    FROM {tbl}"""
        )
    return " UNION ALL ".join(parts)


@register(
    "audit_functional_dependencies",
    _fd_oracle(),
    doc="FUNCTIONAL-DEPENDENCY audit (the Metanome-style profiling "
        "question 'does column A determine column B' — the check that "
        "catches a denormalized dim whose attributes silently drifted "
        "per key): for each candidate FD, compare "
        "COUNT(DISTINCT det) with COUNT(DISTINCT (det, dep)) — the FD "
        "holds iff every determinant maps to exactly one dependent, and "
        "the surplus counts the extra mappings.  One distinct-agg pair "
        "per candidate, exact integers; candidates restricted to "
        "non-null columns so the engines' different NULL conventions "
        "for composite distincts cannot diverge (documented).  "
        "Completes the audit family: row rules (§2.11), FK edges "
        "(referential integrity), column distributions (profile), and "
        "now INTRA-table column relationships",
)
def audit_functional_dependencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # ONE scan + ONE aggregate per TABLE, not per candidate FD: the three
    # orders-table FDs used to be three independent scans/aggregates
    # unioned (3 corpus passes over the same bytes at 100 TB).  All of a
    # table's distinct counters now ride a single Aggregate (Catalyst
    # plans the multi-distinct via Expand — rows × distinct-aggs, still
    # map-side partial, one shuffle, the audit_column_profile shape), and
    # the 1-row wide frame unpivots into per-FD rows with stack() —
    # values, rows, and the oracle are unchanged.
    by_tbl: dict[str, list[tuple[str, str]]] = {}
    for tbl, det, dep in _FD_CANDIDATES:
        by_tbl.setdefault(tbl, []).append((det, dep))
    out = None
    for tbl, fds in by_tbl.items():
        d = t(spark, sf_dir, tbl)
        aggs = []
        for i, (det, dep) in enumerate(fds):
            aggs.append(F.countDistinct(det).alias(f"nd_{i}"))
            aggs.append(F.countDistinct(det, dep).alias(f"np_{i}"))
        wide = d.agg(*aggs)
        stack = ", ".join(
            f"'{tbl}.{det} -> {dep}', nd_{i}, np_{i}"
            for i, (det, dep) in enumerate(fds)
        )
        rows = wide.select(
            F.expr(
                f"stack({len(fds)}, {stack}) AS (fd, n_determinants, n_pairs)"
            )
        ).select(
            "fd",
            F.col("n_determinants").cast("bigint").alias("n_determinants"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            (F.col("n_pairs") == F.col("n_determinants")).alias("holds"),
            (F.col("n_pairs") - F.col("n_determinants"))
            .cast("bigint")
            .alias("n_extra_mappings"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out


import math as _math

_BENFORD_P = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def _benford_oracle() -> str:
    expect = " ".join(
        f"WHEN {d} THEN {_BENFORD_P[d - 1]!r}" for d in range(1, 10)
    )
    return f"""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM digits
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n_amounts,
           CAST(COUNT(*) AS DOUBLE) / n_tot AS observed_p,
           CAST((CASE digit {expect} END) AS DOUBLE) AS benford_p,
           ABS(CAST(COUNT(*) AS DOUBLE) / n_tot
               - CAST((CASE digit {expect} END) AS DOUBLE)) AS abs_dev
    FROM digits, n
    GROUP BY digit, n_tot
    """


@register(
    "audit_benford_first_digit",
    _benford_oracle(),
    doc="BENFORD first-digit audit over order amounts — the classic "
        "forensic-accounting screen (fabricated or constrained amounts "
        "fail the log distribution; TPC-H's uniform-ish pricing "
        "deviates visibly, which is exactly what the audit should "
        "report): per leading digit the count, observed share, the "
        "Benford expectation log10(1+1/d) (computed once in Python and "
        "embedded as the SAME literal in plan and oracle — no runtime "
        "log10, which is not correctly-rounded across libms), and the "
        "absolute deviation.  One scan, one 9-group aggregate",
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    expect = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expect = F.when(
            F.col("digit") == d, F.lit(_BENFORD_P[d - 1])
        ).otherwise(expect)
    # r13: n_tot = sum of the ≤9 per-digit group counts via a full-frame
    # window over the Aggregate (identical BIGINT; count = sum of group
    # counts) — was a separate full orders scan + 1-row broadcast cross
    # (guide §1.2: one pass, not two).
    from pyspark.sql.window import Window

    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_amounts"))
        .withColumn("n_tot", F.sum("n_amounts").over(wtot))
        .select(
            "digit",
            F.col("n_amounts").cast("bigint").alias("n_amounts"),
            (F.col("n_amounts").cast("double") / F.col("n_tot")).alias(
                "observed_p"
            ),
            expect.alias("benford_p"),
            F.abs(
                F.col("n_amounts").cast("double") / F.col("n_tot") - expect
            ).alias("abs_dev"),
        )
    )


@register(
    "pareto_abc_classification",
    """
    WITH rev AS (
      SELECT l.l_partkey AS partkey,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM lineitem l GROUP BY l.l_partkey
    ), tot AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE) AS total
      FROM rev
    ), ranked AS (
      SELECT partkey, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6)))
                    OVER (ORDER BY revenue DESC, partkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
      FROM rev
    ), classed AS (
      SELECT partkey, revenue,
             CASE WHEN cum <= 0.8 * total THEN 'A'
                  WHEN cum <= 0.95 * total THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked, tot
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
             AS class_revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
             / (SELECT total FROM tot) AS revenue_share
    FROM classed GROUP BY abc_class
    """,
    doc="PARETO / ABC CLASSIFICATION of parts by net revenue — the "
        "inventory-analytics classic (A = the head until 80% of "
        "cumulative revenue, B to 95%, C the tail): exact decimal "
        "revenue per part, one descending running decimal sum (ties "
        "broken by part key), class boundaries compared in double "
        "against 0.8/0.95 of the exact total — identical compares in "
        "both engines because every operand is bit-identical.  Plan "
        "shape (r14): the corpus-sized stage is the per-part revenue "
        "aggregate; the running sum is RANGE-DECOMPOSED over the "
        "aggregate-bounded part frame (add_prefix_sum — |parts| is "
        "still linear in corpus, so no single-task global window even "
        "here), the grand total rolls up from the same partials, final "
        "3-row class rollup",
)
def pareto_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ).cast("decimal(30,6)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    # r14 (r13 verdict task 3): the cumulative-revenue running sum was a
    # GLOBAL unpartitioned window over the per-part aggregate — bounded
    # by |parts| but still one task, and |parts| is linear in corpus at
    # 100 TB (within pareto's 9.98 s at the ×100 corpus).  add_prefix_sum
    # range-decomposes it (operators/keys.py): range-partition on
    # (revenue DESC, partkey) — a total order, so the decomposition is
    # deterministic — partition-local running decimal sums +
    # O(partitions)-row offset cumulation.  The per-part aggregate is
    # localCheckpointed FIRST so the range machinery's sampling pass and
    # shuffle read the materialized |parts| frame instead of re-running
    # the lineitem aggregation per pass (without this the sf0.1 A/B
    # regressed 1.63 s -> 4.28 s; with it the corpus stage still runs
    # exactly once, as in r13).  Decimal addition is exact and
    # associative, so both `cum` and the `total` rollup (grand total
    # from the same partials — replacing r13's second unbounded window)
    # are bit-identical to the single-task windows' values.
    from bakery_big_data_spark.operators.keys import add_prefix_sum

    rev_cp = rev.select(
        "partkey",
        "revenue",
        F.col("revenue").cast("decimal(30,6)").alias("_rd"),
        F.lit(0).alias("_g"),
    ).localCheckpoint(eager=True)
    ranked = (
        add_prefix_sum(
            rev_cp,
            "_g",
            [F.col("revenue").desc(), F.col("partkey")],
            "_rd",
            out_col="_cum_dec",
            out_type=None,
            total_col="_tot_dec",
        )
        .select(
            "partkey",
            "revenue",
            F.col("_cum_dec").cast("double").alias("cum"),
            F.col("_tot_dec").cast("double").alias("total"),
        )
    )
    classed = ranked.select(
        "revenue",
        "total",
        F.when(F.col("cum") <= F.lit(0.8) * F.col("total"), "A")
        .when(F.col("cum") <= F.lit(0.95) * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class", "total").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .cast("double")
        .alias("class_revenue"),
    ).select(
        "abc_class",
        "n_parts",
        "class_revenue",
        (F.col("class_revenue") / F.col("total")).alias("revenue_share"),
    )
