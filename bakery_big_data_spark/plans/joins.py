"""Join queries — SURVEY.md §2.3 (J1–J8) plus semi-join (Spark-first addition).

Physical strategy notes (the part that matters at 100 TB):
- dimension joins (`part`, `nation`, `region`, small derived frames) are
  explicitly `broadcast()` — no shuffle of the fact side;
- fact-fact joins shuffle on the join key once; AQE handles skew;
- anti/semi joins use Spark's native left_anti / left_semi (no row
  materialization of the right side beyond the hash set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import (
    DEC,
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
    t,
)


@register(
    "join_inner_broadcast_dim",
    f"""
    SELECT p.p_brand,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    """,
    doc="J1 equi inner join, small dim broadcast (reference silver_to_gold.py:191); "
        "broadcast() avoids shuffling the fact side",
)
def join_inner_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "join_left_outer_keep_unmatched",
    """
    SELECT o.o_orderkey,
           o.o_totalprice,
           c.c_name,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
    FROM orders o
    LEFT JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000
    WHERE o.o_orderkey <= 5000
    """,
    doc="J2 equi left outer join keeping unmatched fact rows "
        "(reference silver_to_gold.py:302-304: facts keep rows without dim match)",
)
def join_left_outer_keep_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        "c_name",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )


@register(
    "join_multiway_star",
    f"""
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           o.o_orderpriority,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           {sql_davg('l.l_quantity', 'avg_qty')},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name, o.o_orderpriority
    """,
    doc="J3 multi-way star join (reference update_ml_features.py:134-139 6-way pipeline); "
        "dims broadcast, single fact-fact shuffle on orderkey",
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "o_orderpriority",
        )
        .agg(
            dsum(revenue, "revenue"),
            davg("l_quantity", "avg_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_sql_tempview",
    f"""
    SELECT s.s_name,
           n.n_name AS nation_name,
           {sql_davg('s.s_acctbal', 'avg_bal')}
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_name, n.n_name
    """,
    doc="J5/S9: SQL join over registered temp views — spark.sql entry point "
        "(reference update_ml_features.py:38-49, bronze_to_silver.py:76)",
)
def join_sql_tempview(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT s.s_name,
               n.n_name AS nation_name,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(s.s_acctbal) AS avg_bal
        FROM v_supplier s
        JOIN v_nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY s.s_name, n.n_name
        """
    )


@register(
    "join_cross_synthesize",
    """
    SELECT n.n_name AS nation_name, r.r_name AS region_name
    FROM nation n
    CROSS JOIN region r
    """,
    doc="J6 cross join for combination synthesis (reference update_ml_features.py:301 "
        "products × equipment); only ever small×small — guarded by design",
)
def join_cross_synthesize(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name"))
    r = t(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    return n.crossJoin(F.broadcast(r))


@register(
    "join_range_interval",
    f"""
    SELECT b.bucket_name,
           COUNT(*) AS n_events,
           {sql_dsum('e.value', 'total_value')}
    FROM events e
    JOIN (
      SELECT 'week1' AS bucket_name, TIMESTAMP '2024-01-01' AS start_ts, TIMESTAMP '2024-01-08' AS end_ts
      UNION ALL SELECT 'week2', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'
      UNION ALL SELECT 'week3', TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22'
    ) b ON e.ts >= b.start_ts AND e.ts < b.end_ts
    GROUP BY b.bucket_name
    """,
    doc="J7 range/theta join — point-in-interval lookup "
        "(reference update_ml_features.py:106 promotion window); intervals are "
        "exploded to covering day buckets so the join is a broadcast HASH join "
        "on to_date(ts) with a residual range predicate — O(rows), not the "
        "O(rows × intervals) BroadcastNestedLoopJoin a raw non-equi join plans",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    intervals = spark.createDataFrame(
        [
            ("week1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
            ("week2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
            ("week3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
        ],
        ["bucket_name", "start_s", "end_s"],
    ).select(
        "bucket_name",
        F.col("start_s").cast("timestamp").alias("start_ts"),
        F.col("end_s").cast("timestamp").alias("end_ts"),
    )
    # Scale pattern: expand each interval to the days it covers (interval
    # tables are small — promotions/buckets — so the expansion is tiny and
    # broadcastable even for year-long windows), then equi-join on the day
    # key.  Catalyst plans BroadcastHashJoin; the range check is a cheap
    # residual filter on matched rows only.
    day_buckets = intervals.select(
        "bucket_name",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.to_date("start_ts"),
                # end_ts is exclusive; a boundary exactly at midnight adds one
                # harmless extra day that the residual predicate filters out.
                F.to_date("end_ts"),
                F.expr("interval 1 day"),
            )
        ).alias("bucket_day"),
    )
    return (
        ev.join(
            F.broadcast(day_buckets),
            (F.to_date(ev.ts) == day_buckets.bucket_day)
            & (ev.ts >= day_buckets.start_ts)
            & (ev.ts < day_buckets.end_ts),
        )
        .groupBy("bucket_name")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
    )


@register(
    "join_semi_anti_membership",
    """
    SELECT c.c_custkey, c.c_name, 'active' AS membership
    FROM customer c
    SEMI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT c.c_custkey, c.c_name, 'orphan' AS membership
    FROM customer c
    ANTI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON c.c_custkey = o.o_custkey
    """,
    doc="J8 anti join + semi join membership audit: entities with ≥1 "
        "qualifying fact tagged 'active' (left_semi; the reference "
        "approximates with DISTINCT joins, silver_to_gold.py:246-253) and "
        "entities without facts tagged 'orphan' (left_anti; the SCD2 'new "
        "rows' branch, silver_to_gold.py:135, rewritten from "
        "left-join+IS NULL) — both sides shuffle once on the same key and "
        "partition exactly like the plain joins at 100 TB",
)
def join_semi_anti_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit("active").alias("membership")
    )
    orphans = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit("orphan").alias("membership")
    )
    return active.unionAll(orphans)


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): six-table join — the "
        "deepest join in the catalog — with customer and supplier "
        "constrained to the SAME nation inside one region and a one-year "
        "order window.  Plan discipline: nation⨝region prune to a handful "
        "of keys and BROADCAST into supplier; the date predicate pushes "
        "into the orders scan before its join; the only big shuffles are "
        "the two fact joins (orders⨝customer on custkey, "
        "lineitem⨝orders on orderkey), and the same-nation equality rides "
        "the supplier hash join rather than becoming a post-join filter",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(asian_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    co = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    lco = li.join(co, li.l_orderkey == F.col("o_orderkey"))
    joined = lco.join(
        F.broadcast(s),
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@register(
    "nation_market_share",
    """
    SELECT o_year,
           CAST(COALESCE(nation_volume, 0.0) / total_volume AS DOUBLE)
             AS mkt_share,
           CAST(COALESCE(nation_volume, 0.0) AS DOUBLE) AS nation_volume,
           total_volume
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                           END AS DECIMAL(30,6))) AS DOUBLE) AS nation_volume,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS total_volume
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN orders o ON o.o_orderkey = l.l_orderkey
                   AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o.o_orderdate < TIMESTAMP '1998-01-01'
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
                   AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      GROUP BY year(o.o_orderdate)
    )
    """,
    doc="TPC-H Q8 shape (national market share): EIGHT-table join — the "
        "deepest in the catalog — computing NATION_3 suppliers' share of "
        "AMERICA-region customers' PROMO-part volume per year, as a ratio "
        "of two decimal-exact conditional sums (single IEEE division of "
        "exact doubles — cross-engine bit-identical).  Plan discipline: "
        "part/supplier/nation/region all broadcast (dims), the date "
        "predicate pushes into the orders scan, and the only large "
        "shuffles are the two fact joins (lineitem⨝orders on orderkey, "
        "orders⨝customer on custkey); the share numerator rides the SAME "
        "aggregate as the denominator — one pass, no self-join",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    america_nations = n1.join(
        F.broadcast(r), n1.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(america_nations),
            c.c_nationkey == america_nations.n_nationkey,
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    agg = joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", vol).cast(DEC)
        )
        .cast("double")
        .alias("nation_volume"),
        F.sum(vol.cast(DEC)).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        (
            F.coalesce(F.col("nation_volume"), F.lit(0.0))
            / F.col("total_volume")
        ).alias("mkt_share"),
        F.coalesce(F.col("nation_volume"), F.lit(0.0)).alias("nation_volume"),
        "total_volume",
    )
