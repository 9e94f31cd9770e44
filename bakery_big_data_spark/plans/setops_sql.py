"""Set operations beyond UNION (SURVEY.md §2.7 "not present" rows) and SQL
subquery forms — INTERSECT/EXCEPT, schema-evolution unionByName, map
functions, a TPC-H-Q3-style composite, EXISTS/scalar subqueries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import dsum, register, sql_dsum, t


@register(
    "set_intersect_except",
    """
    SELECT 'both' AS bucket, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    UNION ALL
    SELECT 'urgent_only', c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
    doc="INTERSECT / EXCEPT set algebra (extension — the reference only has "
        "UNION ALL, §2.7): customers in both priority classes vs urgent-only",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # intersect/subtract are the SET-semantics forms (SQL INTERSECT/EXCEPT);
    # exceptAll would be multiset semantics and keep surplus duplicates
    both = urgent.intersect(low).select(F.lit("both").alias("bucket"), "c_custkey")
    only = urgent.subtract(low).select(
        F.lit("urgent_only").alias("bucket"), "c_custkey"
    )
    return both.unionAll(only)


@register(
    "union_by_name_evolution",
    """
    SELECT o_orderkey, o_totalprice, NULL AS o_discount_applied, 'v1' AS src
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_totalprice * 0.1 AS o_discount_applied, 'v2' AS src
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    doc="Schema-evolution union: unionByName(allowMissingColumns=True) merges "
        "an old-schema batch with a new-schema batch (missing columns NULL) — "
        "the append-compatible evolution path for long-lived tables",
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("src")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") * 0.1).alias("o_discount_applied"),
        F.lit("v2").alias("src"),
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_discount_applied").cast("double").alias("o_discount_applied"),
        "src",
    )


@register(
    "map_functions_roundtrip",
    """
    SELECT event_id, mk AS map_key, mv AS map_value
    FROM (
      SELECT event_id,
             unnest(['type', 'band']) AS mk,
             unnest([event_type, CASE WHEN value >= 50 THEN 'high' ELSE 'low' END]) AS mv
      FROM events WHERE event_id < 1000
    )
    """,
    doc="MapType columns (§2.8 — the reference parses transient maps, "
        "stream_to_bronze.py:112): build map_from_arrays, then explode "
        "entries back to rows (maps emitted as rows because map wire formats "
        "differ across engines)",
)
def map_functions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("band")),
        F.array(
            F.col("event_type"),
            F.when(F.col("value") >= 50, "high").otherwise("low"),
        ),
    )
    return ev.select("event_id", F.explode(m).alias("map_key", "map_value"))


@register(
    "shipping_priority_topk",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped composite: segment filter → 3-way join (dim "
        "broadcast) → grouped revenue → top-10 by revenue "
        "(TakeOrderedAndProject, no global sort)",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "sql_exists_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 1000)
    """,
    doc="Correlated EXISTS / NOT EXISTS subqueries via spark.sql — Catalyst "
        "rewrites them to semi/anti joins (the declarative form of J8/semi)",
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_eq")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_eq")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer_eq c
        WHERE EXISTS (SELECT 1 FROM v_orders_eq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM v_orders_eq o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 1000)
        """
    )


@register(
    "sql_correlated_min_subquery",
    """
    SELECT p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
    """,
    doc="Correlated scalar subquery (TPC-H Q2 shape: cheapest item per "
        "group) — Catalyst decorrelates it into an aggregate + join, no "
        "per-row re-execution",
)
def sql_correlated_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "part").createOrReplaceTempView("v_part_cs")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_retailprice
        FROM v_part_cs p
        WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM v_part_cs p2
                                 WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "collect_sorted_lists",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',')
             AS order_keys_csv,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
             AS priorities_csv
    FROM orders
    WHERE o_custkey <= 200
    GROUP BY o_custkey
    """,
    doc="Deterministic list aggregation: array_sort(collect_list(...)) — "
        "raw collect_list order is partition-dependent, the sort makes the "
        "aggregate reproducible at any parallelism (+ distinct CSV variant). "
        "Both list columns are serialized with array_join for the driver row "
        "(its pandas canonicalizer cannot factorize ARRAY cells — the one "
        "red row of r11); the ARRAY-typed form stays certified under pytest "
        "via collect_sorted_lists_array + tests/test_setops_sql_arrays.py.",
)
def collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("o_orderkey")).cast("array<string>"),
            ",",
        ).alias("order_keys_csv"),
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities_csv"),
    )


def collect_sorted_lists_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY-typed variant of :func:`collect_sorted_lists` (NOT registered:
    the driver's canonicalizer cannot hash top-level ARRAY cells, see
    tests/test_catalog.py::test_no_oracle_complex_top_level_columns).
    Certified by pytest: serializing its array with array_join must equal
    the registered row's order_keys_csv on every group."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    return o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("order_keys"),
    )


@register(
    "sql_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                                  / COUNT(*) FROM orders) AS price_vs_mean
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="Uncorrelated scalar subquery (global mean broadcast into a map-only "
        "projection) — the declarative form of the A4 scalar-aggregate "
        "pattern, no driver round-trip",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                                      / COUNT(*) FROM v_orders_ss) AS price_vs_mean
        FROM v_orders_ss
        WHERE o_orderkey <= 2000
        """
    )


#: Shared recursive-CTE body — Spark 4 runs it natively (WITH RECURSIVE
#: landed in Spark 4.0); DuckDB runs the identical text.  UNION ALL
#: recursion (Spark doesn't support UNION-distinct recursion yet) with a
#: hard depth bound, folded to min-hop by the outer aggregate.
_RCTE_BODY = """
    WITH RECURSIVE edges_all AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), mx AS (
      SELECT MAX(w) AS mw FROM edges_all
    ), edges AS (
      SELECT src, dst FROM edges_all, mx WHERE w * 3 >= mw
    ), reach(node, d) AS (
      SELECT CAST(10 AS INT), 0
      UNION ALL
      SELECT CAST(e.dst AS INT), r.d + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.d < 3
    )
    SELECT CAST(node AS INT) AS nationkey, CAST(MIN(d) AS BIGINT) AS hops
    FROM reach GROUP BY node
"""


@register(
    "sql_recursive_cte_reachability",
    _RCTE_BODY,
    doc="Spark 4 NATIVE recursive CTE (WITH RECURSIVE, new SQL surface "
        "in 4.x — the declarative sibling of the DataFrame-loop "
        "iteration rows): min-hop reachability from one seed nation "
        "over the heavy trade edges, written ONCE and executed "
        "verbatim by both engines — the Spark side is the same SQL "
        "text the oracle runs, so the hash certifies Spark's recursive "
        "execution (UnionLoop) end to end, including the UNION ALL "
        "path multiplicities folded by the outer MIN(d).  Depth-"
        "bounded (d < 3) because UNION ALL recursion enumerates paths, "
        "not nodes — on the nation-bounded graph that is ≤ 25³ rows; "
        "the scalable node-frontier formulation (anti-join layering, "
        "no path enumeration) is graph_bfs_reachability, and the pair "
        "documents the trade",
)
def sql_recursive_cte_reachability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # The edges_all CTE is character-for-character the nation-trade edge
    # aggregate that PageRank/BFS/SSSP share — source it from the one
    # materialized build per (session, sf) instead of re-running the
    # 4-way star join here (guide §1.2).  The RECURSIVE tail below this
    # substitution is the _RCTE_BODY text verbatim, so the row still
    # certifies Spark's native UnionLoop execution end to end; the oracle
    # runs the full original text and the edge aggregate is deterministic,
    # so the values are unchanged.
    from bakery_big_data_spark.plans.graph import _trade_edges

    _trade_edges(spark, sf_dir).createOrReplaceTempView(
        "v_trade_edges_rcte"
    )
    return spark.sql(
        """
    WITH RECURSIVE edges_all AS (
      SELECT src, dst, w FROM v_trade_edges_rcte
    ), mx AS (
      SELECT MAX(w) AS mw FROM edges_all
    ), edges AS (
      SELECT src, dst FROM edges_all, mx WHERE w * 3 >= mw
    ), reach(node, d) AS (
      SELECT CAST(10 AS INT), 0
      UNION ALL
      SELECT CAST(e.dst AS INT), r.d + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.d < 3
    )
    SELECT CAST(node AS INT) AS nationkey, CAST(MIN(d) AS BIGINT) AS hops
    FROM reach GROUP BY node
    """
    )
