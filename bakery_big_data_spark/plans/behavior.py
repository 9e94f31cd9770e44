"""Behavioral / time-series analytics over ``events`` — funnel conversion,
cohort retention, and calendar gap-fill with forward fill.

The reference's dashboard layer stops at daily rollups
(``silver_to_gold.py:373-386``); these are the standard next-step analytics
a production events pipeline serves from the same gold tables.  All three
are pure DataFrame aggregation/window plans (no UDFs, no driver actions):

- **funnel**: one conditional aggregation per user (single shuffle), then a
  global roll-up of a handful of booleans;
- **cohort retention**: per-user first-activity cohort joined back on the
  already-partitioned user key, then a (cohort, offset) distinct count;
- **gap-fill**: per-series date spine via ``sequence``+``explode`` (never a
  driver-side calendar), left join on the series key, and an
  ``IGNORE NULLS`` last-value window for the forward fill.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.cache import PlanCache
from bakery_big_data_spark.plans.base import register, sql_dsum, t

#: persisted per-customer RFM base (bounded LRU, unpersists on evict)
_RFM_CACHE = PlanCache(max_entries=2)


@register(
    "funnel_conversion",
    """
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
           COUNT(*) FILTER (WHERE t_view < t_click) AS n_view_click,
           COUNT(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase)
             AS n_full_funnel,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click) AS DOUBLE)
             / COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS view_to_click,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase)
                AS DOUBLE)
             / COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS full_conversion
    FROM u
    """,
    doc="Strict-order funnel on first occurrences (view -> click -> "
        "purchase): per-user first-touch timestamps from ONE conditional "
        "aggregation (single shuffle on user_id, map-side combinable), "
        "ordering checks and conversion rates from a scalar roll-up of "
        "booleans — events are scanned exactly once; no per-step joins or "
        "re-scans, which is what keeps the funnel cheap at 100 TB",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first = lambda step: F.min(  # noqa: E731
        F.when(F.col("event_type") == step, F.col("ts"))
    )
    u = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    vc = F.col("t_view") < F.col("t_click")
    full = vc & (F.col("t_click") < F.col("t_purchase"))
    return u.agg(
        F.count_if(F.col("t_view").isNotNull()).alias("n_view"),
        F.count_if(vc).alias("n_view_click"),
        F.count_if(full).alias("n_full_funnel"),
        (F.count_if(vc).cast("double") / F.count_if(F.col("t_view").isNotNull()))
        .alias("view_to_click"),
        (F.count_if(full).cast("double") / F.count_if(F.col("t_view").isNotNull()))
        .alias("full_conversion"),
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS DATE))) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT e.user_id, f.cohort_week,
             CAST(FLOOR(date_diff('day', f.cohort_week, CAST(e.ts AS DATE))
                        / 7) AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ), cohort_sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           COUNT(DISTINCT a.user_id) AS n_active,
           CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / ANY_VALUE(s.cohort_size)
             AS retention
    FROM activity a JOIN cohort_sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset
    """,
    doc="Weekly cohort retention: cohort = week of first activity per user, "
        "retention = distinct active users at each week offset / cohort "
        "size.  SINGLE-SCAN plan: the per-user cohort comes from a window "
        "min over the user_id partition (no groupBy+self-join — events are "
        "read once), the (cohort, offset) roll-up counts distinct users, "
        "and the denominator is the offset-0 row of the same roll-up "
        "(every user's first event sits at offset 0 by construction) "
        "fetched with a first_value window over the tiny cohort frame — "
        "no cohort-sizes join at all",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    activity = ev.select(
        "user_id",
        F.date_trunc("week", F.min(F.to_date("ts")).over(wu))
        .cast("date")
        .alias("cohort_week"),
        F.to_date("ts").alias("d"),
    ).select(
        "user_id",
        "cohort_week",
        F.floor(F.datediff(F.col("d"), F.col("cohort_week")) / 7)
        .cast("bigint")
        .alias("week_offset"),
    )
    rolled = activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    wc = Window.partitionBy("cohort_week").orderBy("week_offset")
    return rolled.select(
        "cohort_week",
        "week_offset",
        "n_active",
        (
            F.col("n_active").cast("double") / F.first("n_active").over(wc)
        ).alias("retention"),
    )


@register(
    "timeseries_gapfill",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             {sql_dsum('value', 'revenue')}
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), bounds AS (
      SELECT event_type, MIN(d) AS lo, MAX(d) AS hi FROM daily
      GROUP BY event_type
    ), spine AS (
      SELECT event_type, CAST(gs AS DATE) AS d
      FROM bounds, LATERAL unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS g(gs)
    )
    SELECT s.event_type, s.d,
           daily.revenue IS NOT NULL AS is_observed,
           last_value(daily.revenue IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_filled
    FROM spine s LEFT JOIN daily ON s.event_type = daily.event_type AND s.d = daily.d
    """,
    doc="Calendar gap-fill + forward fill per series: the per-type date "
        "spine comes from sequence()+explode over each series' own min/max "
        "(generated distributed, never a driver calendar), missing days "
        "left-join to NULL, and last_value(IGNORE NULLS) carries the prior "
        "observation forward.  Spine join, daily rollup, and the fill "
        "window all partition on event_type; the bounds aggregate "
        "re-derives the daily rollup (tiny output, but a second events "
        "scan — at true scale persist the daily frame or read it from the "
        "gold layer)",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("revenue")
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            F.col("revenue").isNotNull().alias("is_observed"),
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
        )
    )


@register(
    "anomaly_zscore_daily",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             {sql_dsum('value', 'revenue')}
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), stats AS (
      SELECT event_type, d, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(revenue * revenue AS DECIMAL(30,6))) OVER w AS DOUBLE)
               AS s2,
             CAST(COUNT(*) OVER w AS DOUBLE) AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, revenue,
           (revenue - s / n) / SQRT((s2 - s * s / n) / (n - 1.0)) AS zscore,
           ABS((revenue - s / n) / SQRT((s2 - s * s / n) / (n - 1.0))) > 2.0
             AS is_anomaly
    FROM stats WHERE n >= 7
    """,
    doc="Rolling z-score anomaly detection on the daily revenue series: "
        "trailing-14-row mean/stddev per event_type from decimal-exact "
        "frame sums of x and x² (the plans/base.py convention applied to "
        "window frames — order-independent, bit-identical to the oracle), "
        "flagging |z| > 2 once 7 observations accumulate.  One daily "
        "rollup shuffle + one window pass, both keyed on the series",
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("revenue")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-13, 0)
    )
    r = F.col("revenue")
    s = F.sum(r.cast("decimal(30,6)")).over(w).cast("double")
    s2 = F.sum((r * r).cast("decimal(30,6)")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    stats = daily.select("event_type", "d", "revenue",
                         s.alias("s"), s2.alias("s2"), n.alias("n"))
    z = (F.col("revenue") - F.col("s") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - F.lit(1.0))
    )
    return stats.filter(F.col("n") >= 7).select(
        "event_type",
        "d",
        "revenue",
        z.alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@register(
    "session_window_agg",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Gap-based session aggregation through Spark's BUILT-IN "
        "session_window (30-minute inactivity gap): per-(user, session) "
        "event count and value total, one shuffle on the session key.  The "
        "oracle derives identical sessions independently via lag + "
        "cumulative gap flags, so the hash check certifies the built-in's "
        "merge semantics against a from-first-principles formulation "
        "(batch analogue of the streaming session windows in SURVEY §2.9; "
        "cf. sessionize_events, which exposes the per-event session index)",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("session_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


@register(
    "correlation_matrix_daily",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             {sql_dsum('value', 'revenue')}
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.revenue AS x, b.revenue AS y
      FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type
    ), sums AS (
      SELECT type_a, type_b,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(y * y AS DECIMAL(30,6))) AS DOUBLE) AS sy2
      FROM pairs GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           (n * sxy - sx * sy)
             / SQRT((n * sx2 - sx * sx) * (n * sy2 - sy * sy)) AS pearson_r
    FROM sums
    """,
    doc="Pairwise Pearson correlation between the daily revenue series of "
        "every event-type pair, computed from decimal-exact sums of x, y, "
        "xy, x², y² rather than the engines' native corr() (whose double "
        "accumulation is summation-order-sensitive and diverges between "
        "engines at full precision — same reasoning as plans/base.py "
        "dstd).  The self-join runs on the TINY daily rollup (days × "
        "types), never on raw events; one events shuffle total",
)
def correlation_matrix_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("revenue")
    )
    a = daily.select(
        F.col("event_type").alias("type_a"), "d", F.col("revenue").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "d", F.col("revenue").alias("y")
    )
    pairs = a.join(b, "d").filter(F.col("type_a") < F.col("type_b"))
    dec = lambda c: F.sum(c.cast("decimal(30,6)")).cast("double")  # noqa: E731
    sums = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sx2"),
        dec(F.col("y") * F.col("y")).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = (n * F.col("sxy") - sx * sy) / F.sqrt(
        (n * F.col("sx2") - sx * sx) * (n * F.col("sy2") - sy * sy)
    )
    return sums.select(
        "type_a", "type_b", n.cast("bigint").alias("n_days"), r.alias("pearson_r")
    )


@register(
    "feature_quantile_binning",
    """
    WITH binned AS (
      SELECT o_orderkey, o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM binned GROUP BY decile
    """,
    doc="Equal-frequency (decile) feature binning via NTILE over a total "
        "order (unique tiebreak keeps both engines' tile assignment "
        "identical) with per-bin count and value bounds — the quantile "
        "discretization step of feature engineering, complementing the "
        "equal-width curation_length_histogram.  EXACT deciles without the "
        "single-task global window: scalable_ntile derives SQL NTILE's "
        "buckets from the range-partitioned dense rank + closed-form "
        "bucket math (operators/keys.py), so the heavy steps stay "
        "parallel at 100 TB; approx_percentile boundaries remain the "
        "cheaper alternative when exactness is negotiable",
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.keys import scalable_ntile

    o = t(spark, sf_dir, "orders")
    return (
        scalable_ntile(
            o.select("o_orderkey", "o_totalprice"),
            ["o_totalprice", "o_orderkey"],
            10,
            "decile",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "rfm_segmentation",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             {sql_dsum('o_totalprice', 'monetary')}
      FROM orders
      GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_cell
    FROM (
      SELECT *,
             NTILE(5) OVER (ORDER BY recency_days ASC,  o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency   DESC, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary    DESC, o_custkey) AS m_score
      FROM per_cust
    )
    """,
    doc="RFM customer segmentation (the standard behavioral-marketing "
        "triage): per customer recency (days since last order vs corpus "
        "anchor), frequency, decimal-exact monetary — then quintile "
        "scores via NTILE with custkey tiebreaks and the 3-digit RFM "
        "cell.  One groupBy shuffle + three global ntile windows; at "
        "100 TB the ntile step runs on the COMPACTED per-customer frame "
        "(|customers| << |orders|), and the anchor date is a lazy 1-row "
        "broadcast, not an eager .first()",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.plans.base import DEC

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("_anchor"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("_anchor", "_last").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # NO global ntile windows: an unpartitioned NTILE funnels every
    # customer through one task at 100 TB.  scalable_ntile derives the
    # same buckets from the range-partitioned dense rank + SQL NTILE's
    # closed form (operators/keys.py) — three fully-parallel passes.
    #
    # The three scores are computed INDEPENDENTLY over the persisted
    # compacted frame and equi-joined back on the customer key, never
    # chained: each scalable_ntile evaluates its input ~3 times (local
    # ranks, partition offsets, row count), so chaining compounds to
    # ~27 evaluations of the orders aggregate, while the join shape
    # re-reads a |customers|-sized cached frame (measured 5.5 s → 3.0 s
    # warm at sf0.1; the remainder is the fixed per-pass job overhead of
    # three independent range partitionings, which is what parallelizes
    # at real scale).
    from bakery_big_data_spark.operators.keys import scalable_ntile

    base = _RFM_CACHE.get_or_build(
        spark, (sf_dir, "rfm_per_cust"), lambda: per_cust.persist()
    )
    # r14 (r13 verdict task 9): ONE shared |customers| count rollup feeds
    # all three ntile passes (they tile the same persisted frame, so the
    # count is identical) — the per-call ranked.count() re-rolled the
    # checkpointed frame three times for the same scalar.
    n_shared = base.groupBy().agg(F.count(F.lit(1)).alias("_nt_n"))
    scores = [
        scalable_ntile(
            base, [F.col("recency_days").asc(), F.col("o_custkey")], 5,
            "r_score", n_rows=n_shared,
        ).select("o_custkey", "r_score"),
        scalable_ntile(
            base, [F.col("frequency").desc(), F.col("o_custkey")], 5,
            "f_score", n_rows=n_shared,
        ).select("o_custkey", "f_score"),
        scalable_ntile(
            base, [F.col("monetary").desc(), F.col("o_custkey")], 5,
            "m_score", n_rows=n_shared,
        ).select("o_custkey", "m_score"),
    ]
    scored = base
    for s in scores:
        scored = scored.join(s, "o_custkey")
    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("rfm_cell"),
    )


_EWMA_ALPHA = 0.25


def _ewma_oracle(alpha: float) -> str:
    """Recursive-CTE EWMA re-deriving the applyInPandas fold step-by-step;
    coefficient doubles embedded via ``repr`` so both engines parse the
    exact IEEE values the kernel multiplies with."""
    a = repr(float(alpha))
    b = repr(1.0 - float(alpha))
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             {sql_dsum('value', 'revenue')}
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, d, revenue,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily
    ), ew(event_type, d, i, revenue, ewma) AS (
      SELECT event_type, d, i, revenue, revenue FROM idx WHERE i = 1
      UNION ALL
      SELECT x.event_type, x.d, x.i, x.revenue,
             CAST({a} AS DOUBLE) * x.revenue + CAST({b} AS DOUBLE) * e.ewma
      FROM ew e
      JOIN idx x ON x.event_type = e.event_type AND x.i = e.i + 1
    )
    SELECT event_type, d, revenue, ewma, revenue - ewma AS resid
    FROM ew
    """


@register(
    "anomaly_ewma_control",
    _ewma_oracle(_EWMA_ALPHA),
    doc="EWMA control line (alpha=0.25) over the daily revenue series per "
        "event_type — the sequential-recurrence companion to the rolling "
        "z-score row.  s_i = a*x_i + (1-a)*s_{i-1} is NOT a window-frame "
        "aggregate (frames combine associatively; the closed form needs "
        "(1-a)^-j factors that overflow past ~1000 steps), so this is the "
        "catalog's canonical grouped Arrow fold: daily rollup in plain "
        "hash aggregates FIRST, then one shuffle on the series key and a "
        "per-series applyInPandas pass over calendar-bounded groups "
        "(operators/timeseries.py::ewma — epoch-splitting note for "
        "extreme series).  The kernel's two-multiply-one-add step is "
        "restated verbatim by the oracle's recursive CTE, so every EWMA "
        "value is hash-certified bit-for-bit despite crossing the Arrow "
        "boundary",
)
def anomaly_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.timeseries import ewma

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("revenue")
    )
    folded = ewma(
        daily, keys=["event_type"], order_col="d", value_col="revenue",
        alpha=_EWMA_ALPHA,
    )
    return folded.select(
        "event_type", "d", "revenue", "ewma",
        (F.col("revenue") - F.col("ewma")).alias("resid"),
    )


@register(
    "drift_chisquare_daily",
    """
    WITH src AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 8) AS bin
      FROM events
    ), g AS (
      SELECT bin, COUNT(*) AS gc FROM src GROUP BY bin
    ), gt AS (
      SELECT COUNT(*) AS gn FROM src
    ), o AS (
      SELECT event_type, d, bin, COUNT(*) AS oc
      FROM src GROUP BY event_type, d, bin
    ), n AS (
      SELECT event_type, d, COUNT(*) AS nk FROM src GROUP BY event_type, d
    ), base AS (
      SELECT n.event_type, n.d, n.nk, g.bin,
             CAST(COALESCE(o.oc, 0) AS DOUBLE) AS obs,
             CAST(n.nk AS DOUBLE)
               * (CAST(g.gc AS DOUBLE) / CAST(gt.gn AS DOUBLE)) AS e
      FROM n
      CROSS JOIN g
      CROSS JOIN gt
      LEFT JOIN o ON o.event_type = n.event_type AND o.d = n.d
                 AND o.bin = g.bin
    ), terms AS (
      SELECT event_type, d, nk, ((obs - e) * (obs - e)) / e AS term
      FROM base
    )
    SELECT event_type, d, nk AS n_events,
           CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE) AS chi2,
           CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE) > 20.09
             AS is_drifted
    FROM terms
    GROUP BY event_type, d, nk
    """,
    doc="Train/serve-skew drift detector: per (event_type, day) "
        "chi-square statistic of the daily event-value histogram against "
        "the GLOBAL value distribution (9 fixed-width bins, tail-capped "
        "— FLOOR(value/25) is one double division + exact floor, "
        "deterministic cross-engine), flagged at the df=8 / p=0.01 "
        "critical value 20.09.  The ML-observability primitive a feature "
        "pipeline runs next to its medallion gold: zero-count grid cells "
        "contribute their full expectation (the classic silent bug — a "
        "missing LEFT JOIN makes vanished bins look like no drift).  "
        "Plan: two hash-agg passes over one scan lineage (global + "
        "per-key histograms), a bins-sized broadcast grid, decimal-exact "
        "term sum; all shuffles keyed on the series — nothing global but "
        "the 9-row bin table",
)
def drift_chisquare_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.least(
            F.floor(F.col("value") / F.lit(25.0)).cast("bigint"), F.lit(8)
        ).alias("bin"),
    )
    # r13: ONE events pass — the finest-grain contingency cube `o` is
    # aggregated once and the global-bin/global-total/per-(type,day)
    # margins are BIGINT-exact rollups of it (sum of counts = count),
    # where previously each margin re-scanned events (guide §1.2/§2.3).
    # The cut stops the four consumers re-running the scan; |o| is
    # |types × days × bins| — tiny.
    from bakery_big_data_spark.operators.checkpointing import cut_lineage

    o = cut_lineage(
        src.groupBy("event_type", "d", "bin").agg(
            F.count(F.lit(1)).alias("oc")
        ),
        None,
    )
    g = o.groupBy("bin").agg(F.sum("oc").alias("gc"))
    gt = o.agg(F.sum("oc").alias("gn"))
    n = o.groupBy("event_type", "d").agg(F.sum("oc").alias("nk"))
    base = (
        n.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(gt))
        .join(o, ["event_type", "d", "bin"], "left")
        .select(
            "event_type",
            "d",
            "nk",
            F.coalesce(F.col("oc"), F.lit(0)).cast("double").alias("obs"),
            (
                F.col("nk").cast("double")
                * (F.col("gc").cast("double") / F.col("gn").cast("double"))
            ).alias("e"),
        )
    )
    terms = base.select(
        "event_type",
        "d",
        "nk",
        (
            ((F.col("obs") - F.col("e")) * (F.col("obs") - F.col("e")))
            / F.col("e")
        ).alias("term"),
    )
    chi2 = F.sum(F.col("term").cast("decimal(30,6)")).cast("double")
    return terms.groupBy("event_type", "d", "nk").agg(
        chi2.alias("chi2"), (chi2 > F.lit(20.09)).alias("is_drifted")
    ).select(
        "event_type", "d", F.col("nk").alias("n_events"), "chi2", "is_drifted"
    )


_HOP_SLIDE_US = 86_400_000_000  # 1 day
_HOP_SPANS = 3  # window = 3 days = 3 slides


@register(
    "window_hopping_traffic",
    f"""
    WITH ev AS (
      SELECT event_type, value, epoch_us(ts) AS us FROM events
    ), hops AS (
      SELECT event_type, value,
             (us // {_HOP_SLIDE_US} - g.i) * {_HOP_SLIDE_US} AS win_start_us
      FROM ev, generate_series(0, {_HOP_SPANS - 1}) AS g(i)
    )
    SELECT win_start_us, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'revenue')}
    FROM hops GROUP BY win_start_us, event_type
    """,
    doc="HOPPING (sliding) window aggregation — the overlapping-window "
        "semantics the catalog's tumbling/session rows don't cover: "
        "3-day windows sliding by 1 day per event_type, via Spark's "
        "built-in window(ts, '3 days', '1 day'), which expands each row "
        "into its ceil(window/slide)=3 member windows BEFORE the "
        "aggregate (so partial aggregation still combines map-side; the "
        "only cost at 100 TB is the bounded 3x pre-agg row multiplier, "
        "never a self-join of the rollup).  Window starts are emitted as "
        "unix microseconds — epoch-aligned integer arithmetic on the "
        "timestamp's UTC micros — so the oracle reproduces membership "
        "with a generate_series offset join and the hash is "
        "timezone-proof.  Streaming analogue: the identical groupBy "
        "window(...) clause under a watermark (SURVEY §2.9)",
)
def window_hopping_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    win = ev.groupBy(
        F.window("ts", "3 days", "1 day").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("revenue"),
    )
    return win.select(
        F.unix_micros(F.col("w.start")).alias("win_start_us"),
        "event_type",
        "n_events",
        "revenue",
    )


@register(
    "timeseries_time_weighted_avg",
    """
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(ts) AS t0,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t1
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CAST(t1 - t0 AS BIGINT)) AS BIGINT) AS held_us,
           CAST(SUM(CAST(FLOOR(value * CAST(t1 - t0 AS DOUBLE))
                         AS DECIMAL(30,0))) AS DOUBLE)
             / CAST(SUM(CAST(t1 - t0 AS BIGINT)) AS DOUBLE) AS twa
    FROM seg
    WHERE t1 IS NOT NULL AND t1 > t0
    GROUP BY user_id
    """,
    doc="TIME-WEIGHTED average — the irregular-series mean every "
        "sensor/pricing pipeline needs (a plain AVG over-weights bursty "
        "samples): each observation's value is held until the user's "
        "next event, so twa = sum(value*dt)/sum(dt) over the LEAD "
        "segments (zero-length segments excluded; single-event users "
        "have no holding interval and drop out).  One user-partitioned "
        "window pass + one hash agg, scalable in the number of series; "
        "numeric discipline: the usual decimal-sum convention does NOT "
        "work here (value*dt addends are not exactly representable at 6 "
        "decimals, and Spark's string-based vs DuckDB's binary-based "
        "double->DECIMAL rounding then diverges per addend — measured), "
        "so each weighted term is FLOOR(value * dt_us): one IEEE "
        "multiply + floor on identical doubles, an exact integer below "
        "2^53, summed exactly as DECIMAL(30,0); the final twa is a "
        "single exact-integer divide, bit-stable cross-engine",
)
def timeseries_time_weighted_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t0"),
        F.lead(F.unix_micros("ts")).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    dt = F.col("t1") - F.col("t0")
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dt).alias("held_us"),
        (
            F.sum(
                F.floor(F.col("value") * dt.cast("double")).cast(
                    "decimal(30,0)"
                )
            ).cast("double")
            / F.sum(dt).cast("double")
        ).alias("twa"),
    )


@register(
    "trend_linear_fit_daily",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(t) AS DOUBLE) AS st,
             CAST(SUM(t * t) AS DOUBLE) AS st2,
             CAST(SUM(CAST(y * 1e6 - (y * 1e6 % 1.0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1e6 AS sy,
             CAST(SUM(CAST(CAST(t AS DOUBLE) * y * 1e6
                           - (CAST(t AS DOUBLE) * y * 1e6 % 1.0)
                           AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS sty,
             CAST(SUM(CAST(y * y * 1e6 - (y * y * 1e6 % 1.0)
                           AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS sy2
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           (n * sty - st * sy) / NULLIF(n * st2 - st * st, 0) AS slope,
           sy / n - (n * sty - st * sy) / NULLIF(n * st2 - st * st, 0)
                    * st / n AS intercept,
           ((n * sty - st * sy) * (n * sty - st * sy))
             / NULLIF((n * st2 - st * st) * (n * sy2 - sy * sy), 0) AS r2
    FROM sums
    """,
    doc="Per-series linear TREND detection: closed-form OLS of daily "
        "revenue against the epoch-day index for every event_type — "
        "slope, intercept, and r² from one daily rollup plus one "
        "five-sum aggregation (n, Σt, Σt², Σty, Σy, Σy²), the classic "
        "sufficient-statistics shape: both passes are map-side "
        "combinable hash aggs, nothing is ever sorted or windowed.  "
        "Integer sums (t, t²) stay exact BIGINTs; the float sums (y, "
        "ty, y²) TRUNC-quantize addends at 1e-6 via x - (x % 1.0) — "
        "fmod is engine-identical IEEE, unlike Spark's FLOOR(double) "
        "which returns LONG and overflows once an addend passes 9.2e18 "
        "(the r11 ×100 stress caught exactly that: y²·1e6 ≈ 2.5e19 on "
        "the sf10-equivalent corpus) — then accumulate in exact "
        "DECIMAL(38,0) (the PCA-overflow fix pattern: 128-bit sums "
        "survive any corpus size), so slope/intercept/r² are single "
        "IEEE expressions on identical inputs, hash-exact cross-engine",
)
def trend_linear_fit_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("t"),
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("y")
    )

    def q6(col):
        # trunc in DOUBLE space (x - x % 1.0): integer-valued doubles
        # convert to DECIMAL(38,0) exactly in both engines; FLOOR(double)
        # would materialize a LONG and overflow at stress scale
        scaled = col * F.lit(1e6)
        q = scaled - scaled % F.lit(1.0)
        return F.sum(q.cast("decimal(38,0)")).cast("double") / F.lit(1e6)

    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("st2"),
        q6(F.col("y")).alias("sy"),
        q6(F.col("t").cast("double") * F.col("y")).alias("sty"),
        q6(F.col("y") * F.col("y")).alias("sy2"),
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    den = F.col("n") * F.col("st2") - F.col("st") * F.col("st")
    # degenerate series (single day: den = 0; constant y: r2 den = 0)
    # yield NULL, the dstd convention — an unguarded divide raises
    # DIVIDE_BY_ZERO under ANSI (caught by the adversarial-regeneration
    # guard on a one-day corpus)
    slope = F.when(den != 0, num / den)
    r2_den = den * (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy"))
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("slope"),
        (F.col("sy") / F.col("n") - slope * F.col("st") / F.col("n")).alias(
            "intercept"
        ),
        F.when(r2_den != 0, (num * num) / r2_den).alias("r2"),
    )


@register(
    "timeseries_ohlc_bars",
    """
    SELECT event_type,
           CAST(ts AS DATE) AS d,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS volume,
           COUNT(*) AS n_ticks
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    """,
    doc="Daily OHLC bars per series — the financial/sensor downsampling "
        "pattern, and the max_by/min_by aggregate surface (SQL:2023 "
        "ANY_VALUE-family ordered-arg aggregates) the window rows don't "
        "cover: open/close are arg-min/arg-max of value by the total "
        "(ts, event_id) order — ONE aggregation, no window: each "
        "partial keeps its best struct and merge compares keys, so the "
        "shuffle carries only per-(type, day) partials.  Honest plan "
        "note: struct-keyed min_by has no fixed-width buffer, so Spark "
        "plans SortAggregate — a per-partition sort on the GROUP key "
        "(spill-safe, partial agg intact), still far cheaper than the "
        "window formulation's shuffle of every tick.  The struct tiebreak "
        "makes the answer total-order deterministic, so the oracle's "
        "ordered aggregates FIRST/LAST(value ORDER BY ts, event_id) "
        "hash identically",
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ts_key = F.struct("ts", "event_id")
    return ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.min_by("value", ts_key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ts_key).alias("close"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("double")
        .alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "skew_profile_keys",
    """
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_keys FROM per_key
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rk
      FROM per_key
    )
    SELECT t.n_keys,
           t.n AS n_rows,
           CAST((SELECT SUM(CAST(c AS DECIMAL(30,0)) * c) FROM per_key)
                AS DOUBLE)
             / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)) AS hhi,
           CAST((SELECT MAX(c) FROM per_key) AS DOUBLE)
             / CAST(t.n AS DOUBLE) AS top1_share,
           CAST((SELECT CAST(SUM(c) AS BIGINT) FROM ranked WHERE rk <= 10)
                AS DOUBLE)
             / CAST(t.n AS DOUBLE) AS top10_share,
           CAST(t.n AS DOUBLE)
             / (CAST(t.n_keys AS DOUBLE)
                * CAST((SELECT MAX(c) FROM per_key) AS DOUBLE))
             AS balance_ratio
    FROM tot t
    """,
    doc="Key-skew PROFILER for shuffle planning — the diagnostic that "
        "decides whether a join/agg key needs salting BEFORE the job "
        "runs at 100 TB: per-key counts in one hash agg, then the "
        "Herfindahl concentration index Σ(c/n)² (a log-free skew "
        "measure, unlike entropy — catalog ln() ban), the top-1/top-10 "
        "key shares, and n/(keys·max) balance ratio (1.0 = perfectly "
        "uniform; the inverse of the hottest reducer's overload "
        "factor).  The top-10 cut ranks ONLY the per-key rollup "
        "(O(distinct keys), never raw rows).  Exact integer counts, "
        "single IEEE divides — hash-exact",
)
def skew_profile_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_key = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.col("user_id"))
    ranked = per_key.withColumn("rk", F.row_number().over(w))
    top10 = ranked.filter(F.col("rk") <= 10).agg(
        F.sum("c").alias("s10")
    )
    agg = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.sum(F.col("c").cast("decimal(30,0)") * F.col("c"))
        .cast("double")
        .alias("sc2"),
        F.max("c").alias("cmax"),
    )
    nd = F.col("n_rows").cast("double")
    return agg.crossJoin(F.broadcast(top10)).select(
        "n_keys",
        "n_rows",
        (F.col("sc2") / (nd * nd)).alias("hhi"),
        (F.col("cmax").cast("double") / nd).alias("top1_share"),
        (F.col("s10").cast("double") / nd).alias("top10_share"),
        (
            nd
            / (F.col("n_keys").cast("double") * F.col("cmax").cast("double"))
        ).alias("balance_ratio"),
    )


_AB_Z = 1.96  # two-sided 95%


def _wilson_sql(p: str, n: str) -> tuple[str, str]:
    """(lower, upper) Wilson score interval SQL for rate ``p`` over ``n``
    trials — fixed operation order, shared verbatim by both bounds."""
    z = repr(_AB_Z)
    center = f"({p} + {z} * {z} / (2.0 * {n})) / (1.0 + {z} * {z} / {n})"
    half = (
        f"({z} * sqrt({p} * (1.0 - {p}) / {n}"
        f" + {z} * {z} / (4.0 * {n} * {n})))"
        f" / (1.0 + {z} * {z} / {n})"
    )
    return f"{center} - {half}", f"{center} + {half}"


def _ab_oracle() -> str:
    lo_c, hi_c = _wilson_sql("rate_c", "n_c")
    lo_t, hi_t = _wilson_sql("rate_t", "n_t")
    return f"""
    WITH counts AS (
      SELECT
        CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
             AS BIGINT) AS n_c,
        CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END)
             AS BIGINT) AS n_t,
        CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0
                                      AND event_type = 'purchase'
                                 THEN user_id END) AS BIGINT) AS conv_c,
        CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1
                                      AND event_type = 'purchase'
                                 THEN user_id END) AS BIGINT) AS conv_t
      FROM events
    ), rates AS (
      SELECT n_c, n_t, conv_c, conv_t,
             CAST(conv_c AS DOUBLE) / n_c AS rate_c,
             CAST(conv_t AS DOUBLE) / n_t AS rate_t
      FROM counts
    )
    SELECT n_c, n_t, conv_c, conv_t, rate_c, rate_t,
           {lo_c} AS wilson_lo_c, {hi_c} AS wilson_hi_c,
           {lo_t} AS wilson_lo_t, {hi_t} AS wilson_hi_t,
           rate_t - rate_c AS abs_uplift,
           ({lo_t}) > ({hi_c}) OR ({lo_c}) > ({hi_t}) AS cis_disjoint
    FROM rates
    """


@register(
    "ab_test_conversion_lift",
    _ab_oracle(),
    doc="A/B EXPERIMENT readout — the analysis every behavioral "
        "warehouse runs on every launch: users hash-split into "
        "control/treatment (user_id parity — in production the same "
        "key-derived hash-split as curation_hash_split), per-variant "
        "user-level conversion (distinct converters / distinct users, "
        "so multi-purchase users count once), Wilson 95% score "
        "intervals (the small-sample-safe interval — never escapes "
        "[0,1], unlike the normal approximation), absolute uplift, and "
        "a conservative disjoint-CIs significance flag.  ONE scan: all "
        "four distinct counters in a single conditional aggregate "
        "(Catalyst Expand, the audit_column_profile shape).  The "
        "interval arithmetic is a fixed chain of IEEE ops (sqrt is "
        "correctly-rounded in both engines; z = 1.96 literal) shared "
        "verbatim between both bounds and both variants, so every "
        "bound is bit-identical cross-engine",
)
def ab_test_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    is_c = F.col("user_id") % 2 == 0
    is_t = F.col("user_id") % 2 == 1
    # Per-user pre-aggregate first: one map-side-combinable shuffle of
    # |distinct users| partial rows, then plain conditional counts over
    # the per-user frame.  The four-way COUNT(DISTINCT ...) form planned
    # a 4x Expand of every event row into the exchange; the integers are
    # identical (a distinct user count IS a count over the user rollup,
    # and 'converted' is MAX(is purchase) per user).
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("_p")
    )
    conv = F.col("_p") == 1
    counts = per_user.agg(
        F.count_if(is_c).alias("n_c"),
        F.count_if(is_t).alias("n_t"),
        F.count_if(is_c & conv).alias("conv_c"),
        F.count_if(is_t & conv).alias("conv_t"),
    )
    rates = counts.select(
        "n_c",
        "n_t",
        "conv_c",
        "conv_t",
        (F.col("conv_c").cast("double") / F.col("n_c")).alias("rate_c"),
        (F.col("conv_t").cast("double") / F.col("n_t")).alias("rate_t"),
    )

    def wilson(p, n):
        z = F.lit(_AB_Z)
        center = (p + z * z / (F.lit(2.0) * n)) / (
            F.lit(1.0) + z * z / n
        )
        half = (
            z
            * F.sqrt(
                p * (F.lit(1.0) - p) / n
                + z * z / (F.lit(4.0) * n * n)
            )
        ) / (F.lit(1.0) + z * z / n)
        return center - half, center + half

    lo_c, hi_c = wilson(F.col("rate_c"), F.col("n_c"))
    lo_t, hi_t = wilson(F.col("rate_t"), F.col("n_t"))
    return rates.select(
        "n_c",
        "n_t",
        "conv_c",
        "conv_t",
        "rate_c",
        "rate_t",
        lo_c.alias("wilson_lo_c"),
        hi_c.alias("wilson_hi_c"),
        lo_t.alias("wilson_lo_t"),
        hi_t.alias("wilson_hi_t"),
        (F.col("rate_t") - F.col("rate_c")).alias("abs_uplift"),
        ((lo_t > hi_c) | (lo_c > hi_t)).alias("cis_disjoint"),
    )


@register(
    "attribution_last_touch",
    """
    WITH touches AS (
      SELECT user_id, ts, event_type FROM (
        SELECT user_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type <> 'purchase'
      ) WHERE rn = 1
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), attributed AS (
      SELECT p.event_id, p.value, t.event_type AS channel
      FROM purchases p ASOF LEFT JOIN touches t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM purchases
    )
    SELECT COALESCE(channel, 'unattributed') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS DOUBLE) / n_total AS purchase_share
    FROM attributed, n
    GROUP BY channel, n_total
    """,
    doc="LAST-TOUCH revenue ATTRIBUTION — the marketing-analytics "
        "question behavioral warehouses exist to answer: each purchase "
        "credited to the user's latest preceding non-purchase event "
        "(ties at one timestamp resolved to the highest event_id, a "
        "deterministic winner), purchases with no prior touch bucketed "
        "'unattributed'; per channel: purchase count, decimal-summed "
        "revenue, share of all purchases.  Runs on the as-of machinery "
        "(operators/asof.py — union + partitioned running-last, ONE "
        "shuffle keyed by user, linear scan, no range/theta join "
        "regardless of lookback depth); the oracle states the same "
        "semantics with DuckDB's native ASOF LEFT JOIN — two engines, "
        "two as-of implementations, one hash",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from bakery_big_data_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", F.col("event_type").alias("channel"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    attributed = asof_join(
        purchases, touches, "user_id", "ts", "ts", ["channel"]
    )
    # r13: n_total = window-sum of the per-channel counts — asof_join is
    # left-preserving (one output row per purchase, NULL channel when no
    # prior touch), so the sum over channel groups IS the purchase count
    # the former third events scan + 1-row broadcast cross recomputed
    # (guide §1.2).  Window sits above the Aggregate (≤|channels| rows).
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("channel"), F.lit("unattributed")).alias(
                "channel"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .withColumn("n_total", F.sum("n_purchases").over(wtot))
        .select(
            "channel",
            "n_purchases",
            "revenue",
            (F.col("n_purchases").cast("double") / F.col("n_total")).alias(
                "purchase_share"
            ),
        )
    )


@register(
    "timeseries_seasonal_decompose",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    ), tr AS (
      SELECT day, revenue,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER w
                            AS DOUBLE) / 7.0
                  ELSE NULL END AS trend
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
      SELECT day, revenue, trend,
             revenue - trend AS detrended,
             CAST((day - DATE '1990-01-01') % 7 AS BIGINT) AS dow
      FROM tr
    ), seas AS (
      -- single-day / short series: every trend is NULL, COUNT = 0 — the
      -- NULLIF keeps ANSI division from raising (the trend-OLS lesson)
      SELECT dow,
             CAST(SUM(CAST(detrended AS DECIMAL(30,6))) AS DOUBLE)
               / NULLIF(COUNT(detrended), 0) AS seasonal
      FROM det GROUP BY dow
    )
    SELECT d.day, d.revenue, d.trend, d.dow, s.seasonal,
           d.detrended - s.seasonal AS residual
    FROM det d JOIN seas s ON d.dow = s.dow
    """,
    doc="Classical SEASONAL DECOMPOSITION of the daily revenue series "
        "(trend + weekly seasonal + residual — the moving-average "
        "decomposition every forecasting pipeline starts from): trend = "
        "centered 7-day moving average (exact decimal window sum / 7, "
        "NULL at the edges where the frame is short — stated, not "
        "fudged), weekly seasonal = per-day-of-week mean of the "
        "detrended series (decimal-exact sum / non-null count; dow via "
        "integer day-diff mod 7, immune to the engines' different "
        "dayofweek() conventions), residual = detrended - seasonal.  "
        "Plan shape: one groupBy to days, then ONE unpartitioned window "
        "over the AGGREGATE-BOUNDED daily frame (O(days), the shape the "
        "plan guard allows), one tiny dow aggregate broadcast back.  "
        "Complements trend_linear_fit_daily (parametric OLS) with the "
        "non-parametric decomposition",
)
def timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "revenue",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum(F.col("revenue").cast("decimal(30,6)"))
            .over(w)
            .cast("double")
            / F.lit(7.0),
        ).alias("trend"),
    )
    det = tr.select(
        "day",
        "revenue",
        "trend",
        (F.col("revenue") - F.col("trend")).alias("detrended"),
        (
            F.datediff(F.col("day"), F.lit("1990-01-01").cast("date"))
            .cast("bigint")
            % 7
        ).alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.col("detrended").cast("decimal(30,6)")).cast("double")
            / F.nullif(F.count("detrended"), F.lit(0))
        ).alias("seasonal")
    )
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        "revenue",
        "trend",
        "dow",
        "seasonal",
        (F.col("detrended") - F.col("seasonal")).alias("residual"),
    )


@register(
    "sessions_peak_concurrency",
    """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), se AS (
      SELECT user_id, us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), sessions AS (
      SELECT user_id, sid, MIN(us) AS s_us, MAX(us) AS e_us
      FROM se GROUP BY user_id, sid
    ), bounds AS (
      SELECT s_us AS us, 1 AS delta FROM sessions
      UNION ALL
      SELECT e_us + 1, -1 FROM sessions
    ), run AS (
      SELECT us, delta,
             CAST(SUM(delta) OVER (ORDER BY us, delta
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS conc
      FROM bounds
    )
    SELECT CAST(us // 86400000000 AS BIGINT) AS day_idx,
           CAST(MAX(GREATEST(conc, conc - delta)) AS BIGINT)
             AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions_started
    FROM run GROUP BY 1
    """,
    doc="PEAK CONCURRENCY gauge via the classic SWEEP-LINE: gap-30min "
        "sessions (the sessionize_events islands) become (+1 at start, "
        "-1 just after end) boundary events; one global running sum "
        "ordered by (instant, delta) — ends sort before starts at a "
        "shared instant, so touching sessions never double-count — "
        "gives the live concurrency at every boundary, and "
        "GREATEST(conc, conc - delta) folds the carried-in plateau so "
        "a day whose first boundary is an end still reports the "
        "overnight peak.  Capacity planning's favorite number, exact.  "
        "Plan shape (r14): the boundary running sum is a SEGMENTED "
        "sweep-line — per-time-bucket local prefix sums and plateau "
        "folds (a PARTITIONED window, parallel across buckets) reduced "
        "to one row per bucket, carry-in levels cumulated over the "
        "bucket frame whose size is calendar-bounded, not corpus-"
        "bounded — so no single-task global-sort window remains even "
        "over the session-boundary frame (2 rows per session but still "
        "linear in corpus).  Tie-permutation safe: ties share a us, "
        "hence a bucket, and rows within an (instant, delta) tie are "
        "identical, so the conc multiset and the daily MAX are order-"
        "invariant",
)
def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    g = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.when(gap_us <= 1800 * 1_000_000, 0).otherwise(1).alias(
            "new_session"
        ),
    )
    ws = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    se = g.select(
        "user_id", "us", F.sum("new_session").over(ws).alias("sid")
    )
    sessions = se.groupBy("user_id", "sid").agg(
        F.min("us").alias("s_us"), F.max("us").alias("e_us")
    )
    # r13: +1/−1 boundary events via ONE explode instead of a two-leg
    # union — the union re-executed the whole sessionization chain
    # (events scan + two windows + groupBy) once per leg (guide §1.2).
    # Same (us, delta) multiset.
    bounds = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_us").alias("us"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.col("e_us") + F.lit(1)).alias("us"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("_b")
    ).select("_b.us", "_b.delta")
    # r14 (r13 verdict task 3): the boundary running sum was the last
    # GLOBAL unpartitioned window in the catalog — Window.orderBy("us",
    # "delta") funneled every session boundary through ONE task (measured
    # 23 s single-task at the ×100 corpus; linear in corpus at 100 TB).
    # SEGMENTED SWEEP-LINE instead (guide §8: use what the optimizer
    # cannot know — time is bucketable and the sweep's prefix sum is
    # associative): bucket boundaries into fixed time slices, run the
    # prefix sum and the GREATEST plateau fold LOCALLY per bucket (a
    # PARTITIONED window — parallel across buckets), reduce each bucket
    # to (net, max_fold, n_starts), and cumulate carry-in levels over the
    # BUCKET frame, whose size is bounded by calendar-time/bucket —
    # independent of corpus rows, the legitimate tiny-frame global
    # window.  Exactness: buckets are contiguous in the (us, delta)
    # global order and ties (same us ⇒ same bucket) stay intra-bucket,
    # so every row's conc = carry(bucket) + local_prefix and
    # GREATEST(conc, conc-delta) = carry + GREATEST(p, p-delta) —
    # the daily MAX therefore decomposes exactly over buckets.  An A/B
    # against the repartitionByRange decomposition (operators/keys.py
    # add_prefix_sum) chose this shape: the range machinery's sampling
    # pass + eager checkpoint re-ran the sessionization lineage ~3x
    # (1.25 s -> 6.44 s at sf0.1), while the bucket scan adds only one
    # hash exchange.  Bucket width is the skew knob at real scale
    # (default 1 h; must divide the 86,400 s day).
    bucket_us = int(
        os.environ.get("SPARK_GRAFT_SWEEP_BUCKET_US", str(3_600_000_000))
    )
    per_day = 86_400_000_000 // bucket_us
    w1 = (
        Window.partitionBy("_bkt")
        .orderBy("us", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bounds.withColumn(
        "_bkt", F.expr(f"us div {bucket_us}").cast("bigint")
    ).select(
        "_bkt",
        "delta",
        F.sum("delta").over(w1).alias("_p"),
    )
    per_bkt = (
        local.select(
            "_bkt",
            "delta",
            F.greatest(F.col("_p"), F.col("_p") - F.col("delta")).alias("_g"),
        )
        .groupBy("_bkt")
        .agg(
            F.sum("delta").alias("_net"),
            F.max("_g").alias("_maxg"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "_starts"
            ),
        )
    )
    w2 = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    carried = per_bkt.select(
        F.expr(f"_bkt div {per_day}").cast("bigint").alias("day_idx"),
        (
            F.coalesce(F.sum("_net").over(w2), F.lit(0)) + F.col("_maxg")
        ).alias("_peak_b"),
        "_starts",
    )
    return carried.groupBy("day_idx").agg(
        F.max("_peak_b").cast("bigint").alias("peak_concurrency"),
        F.sum("_starts").cast("bigint").alias("n_sessions_started"),
    )


@register(
    "timeseries_forecast_backtest",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    ), mx AS (
      SELECT MAX(day) AS maxd FROM daily
    )
    SELECT d.day,
           d.revenue AS actual,
           n.revenue AS fc_naive,
           s.revenue AS fc_seasonal,
           ABS(d.revenue - n.revenue) AS err_naive,
           ABS(d.revenue - s.revenue) AS err_seasonal,
           ABS(d.revenue - s.revenue) < ABS(d.revenue - n.revenue)
             AS seasonal_wins
    FROM daily d
    LEFT JOIN daily n ON n.day = d.day - 1
    LEFT JOIN daily s ON s.day = d.day - 7
    CROSS JOIN mx
    WHERE d.day > mx.maxd - 28
    """,
    doc="FORECAST BACKTEST — the evaluation loop every forecasting "
        "pipeline runs before trusting a model: over the last 28 days "
        "of the daily revenue series, score the two standard baselines "
        "(naive = yesterday, seasonal-naive = same weekday last week) "
        "against actuals, with per-day absolute errors and the "
        "which-model-wins bit.  Any real model must beat both to earn "
        "deployment; the decomposition row supplies the seasonal "
        "structure these baselines exploit.  Exact decimal daily sums, "
        "date-integer arithmetic (no interval/timezone skew), NULL-"
        "propagating errors where a lag day is absent.  Plan: one "
        "groupBy to days, two self-joins on the AGGREGATE-BOUNDED "
        "daily frame (broadcast, O(days)), lazy 1-row max-date cross",
)
def timeseries_forecast_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue")
        )
    )
    mx = daily.agg(F.max("day").alias("maxd"))
    n = daily.select(
        F.col("day").alias("n_day"), F.col("revenue").alias("fc_naive")
    )
    s = daily.select(
        F.col("day").alias("s_day"), F.col("revenue").alias("fc_seasonal")
    )
    err_n = F.abs(F.col("actual") - F.col("fc_naive"))
    err_s = F.abs(F.col("actual") - F.col("fc_seasonal"))
    return (
        daily.select("day", F.col("revenue").alias("actual"))
        .join(F.broadcast(n), F.date_sub(F.col("day"), 1) == F.col("n_day"), "left")
        .join(F.broadcast(s), F.date_sub(F.col("day"), 7) == F.col("s_day"), "left")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.date_sub(F.col("maxd"), 28))
        .select(
            "day",
            "actual",
            "fc_naive",
            "fc_seasonal",
            err_n.alias("err_naive"),
            err_s.alias("err_seasonal"),
            (err_s < err_n).alias("seasonal_wins"),
        )
    )
