"""Scalar-function queries — SURVEY.md §2.8 (string / date / math / JSON /
array) including calendar-dimension generation.

All expressions are built-in ``pyspark.sql.functions`` (JVM, whole-stage
codegen) — zero UDFs, matching the reference's no-UDF surface (§2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import register, t


@register(
    "date_dimension_derivations",
    """
    SELECT CAST(o_orderdate AS DATE) AS d,
           EXTRACT(day FROM o_orderdate) AS day_of_month,
           EXTRACT(month FROM o_orderdate) AS month_num,
           quarter(o_orderdate) AS quarter_num,
           EXTRACT(year FROM o_orderdate) AS year_num,
           dayname(o_orderdate) AS weekday_name,
           monthname(o_orderdate) AS month_name,
           CASE WHEN dayname(o_orderdate) IN ('Saturday','Sunday') THEN TRUE ELSE FALSE END AS is_weekend,
           CASE
             WHEN EXTRACT(month FROM o_orderdate) IN (12,1,2) THEN 'winter'
             WHEN EXTRACT(month FROM o_orderdate) IN (3,4,5) THEN 'spring'
             WHEN EXTRACT(month FROM o_orderdate) IN (6,7,8) THEN 'summer'
             ELSE 'autumn'
           END AS season
    FROM (SELECT DISTINCT o_orderdate FROM orders) x
    """,
    doc="§2.8 date-part derivations for dim_calendar "
        "(reference silver_to_gold.py:44-64: dayofmonth/month/quarter/year, "
        "date_format EEEE/MMMM, weekend + season case ladders)",
)
def date_dimension_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderdate").distinct()
    month = F.month("o_orderdate")
    weekday = F.date_format("o_orderdate", "EEEE")
    return o.select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.dayofmonth("o_orderdate").alias("day_of_month"),
        month.alias("month_num"),
        F.quarter("o_orderdate").alias("quarter_num"),
        F.year("o_orderdate").alias("year_num"),
        weekday.alias("weekday_name"),
        F.date_format("o_orderdate", "MMMM").alias("month_name"),
        weekday.isin("Saturday", "Sunday").alias("is_weekend"),
        F.when(month.isin(12, 1, 2), "winter")
        .when(month.isin(3, 4, 5), "spring")
        .when(month.isin(6, 7, 8), "summer")
        .otherwise("autumn")
        .alias("season"),
    )


@register(
    "calendar_generation",
    """
    SELECT CAST(d AS DATE) AS calendar_date,
           EXTRACT(year FROM d) AS year_num,
           EXTRACT(month FROM d) AS month_num,
           dayname(d) AS weekday_name
    FROM (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31', INTERVAL 1 DAY)) AS d
    )
    """,
    doc="§2.8 calendar generation: sequence(start, end, interval 1 day) + explode "
        "(reference silver_to_gold.py:44-46)",
)
def calendar_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = spark.sql(
        """
        SELECT explode(sequence(DATE'2024-01-01', DATE'2024-03-31', interval 1 day)) AS d
        """
    )
    return cal.select(
        F.col("d").alias("calendar_date"),
        F.year("d").alias("year_num"),
        F.month("d").alias("month_num"),
        F.date_format("d", "EEEE").alias("weekday_name"),
    )


@register(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderdate - INTERVAL 30 DAY AS DATE) AS lookback_30d,
           CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '2001-12-31') AS days_to_eoy,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           epoch_us(o_orderdate) AS order_epoch_us
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="§2.8 date math: date_sub/date_add/datediff/last_day/trunc/unix epoch "
        "(reference silver_to_gold.py:184,251,264; update_ml_features.py:238,254; "
        "bronze_to_silver.py:200)",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.date_sub(d.cast("date"), 30).alias("lookback_30d"),
        F.date_add(d.cast("date"), 7).alias("due_date"),
        F.datediff(F.lit("2001-12-31").cast("date"), d.cast("date")).cast("bigint").alias("days_to_eoy"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.trunc(d.cast("date"), "month").alias("month_start"),
        # o_orderdate is TIMESTAMP_NTZ; session tz is pinned to UTC (tune()),
        # so the cast makes unix_micros agree with DuckDB's naive epoch_us.
        F.unix_micros(d.cast("timestamp")).alias("order_epoch_us"),
    )


@register(
    "string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS segment_lower,
           concat(c_name, ':', c_mktsegment) AS name_tagged,
           concat_ws('|', c_name, c_mktsegment) AS name_piped,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           trim(c_name) AS name_trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_name, '#', '-') AS name_dashed,
           regexp_extract(c_name, '([0-9]+)', 1) AS key_digits
    FROM customer
    WHERE c_custkey <= 500
    """,
    doc="§2.8 string functions: concat/concat_ws/upper/lower/substring/length/"
        "trim/lpad/replace/regexp_extract (reference silver_to_gold.py:257-258, "
        "update_ml_features.py:140,251,302-303, load_bronze_from_csv.py:7)",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.concat("c_name", F.lit(":"), "c_mktsegment").alias("name_tagged"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_piped"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim("c_name").alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace("c_name", F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("key_digits"),
    )


@register(
    "math_functions",
    """
    SELECT l_orderkey,
           l_linenumber,
           abs(l_discount - 0.05) AS discount_deviation,
           greatest(l_quantity, 10.0) AS qty_floor10,
           least(l_quantity, 40.0) AS qty_cap40,
           greatest(least(l_quantity * 2.5, 100.0), 0.0) AS efficiency_clamped,
           sqrt(l_extendedprice) AS price_sqrt,
           power(l_discount, 2) AS discount_sq,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
           mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    doc="§2.8 math: abs/greatest/least/clamp/sqrt/pow/floor/ceil/sign/mod "
        "(reference silver_to_gold.py:392-395 efficiency clamp, "
        "update_ml_features.py:263-269 probability cap, silver_to_gold.py:211 abs)",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("discount_deviation"),
        F.greatest("l_quantity", F.lit(10.0)).alias("qty_floor10"),
        F.least("l_quantity", F.lit(40.0)).alias("qty_cap40"),
        F.greatest(F.least(F.col("l_quantity") * 2.5, F.lit(100.0)), F.lit(0.0)).alias(
            "efficiency_clamped"
        ),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow("l_discount", 2).alias("discount_sq"),
        # Engine-stable integer widths on both sides: Spark floor/ceil yield
        # BIGINT natively (DuckDB's yield DOUBLE → oracle casts), and signum
        # yields DOUBLE (DuckDB sign yields TINYINT → both cast to BIGINT).
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "json_extract_payload",
    """
    SELECT event_id,
           event_type,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
    doc="§2.8 JSON unpack of semi-structured payload column "
        "(reference stream_to_bronze.py:59,107,112 from_json; "
        "init_iceberg_tables.py:94 raw_payload STRING)",
)
def json_extract_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.cast("int") >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "json_struct_roundtrip",
    """
    SELECT event_id,
           to_json(struct_pack(
             event_type := event_type,
             user_id := user_id,
             k := CAST(json_extract_string(props, '$.k') AS INT)
           )) AS payload_json
    FROM events
    WHERE event_id <= 1000
    """,
    doc="§2.8 struct→JSON re-assembly (reference load_bronze_from_csv.py:84-96,"
        "117-125 struct(...)→to_json nesting rebuild)",
)
def json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") <= 1000)
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type").alias("event_type"),
                F.col("user_id").alias("user_id"),
                F.get_json_object("props", "$.k").cast("int").alias("k"),
            )
        ).alias("payload_json"),
    )


@register(
    "array_explode_aggregate",
    """
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(emb_head AS DECIMAL(30,12))) AS DOUBLE) AS sum_head
    FROM (
      SELECT label, CAST(embedding[1] AS DOUBLE) AS emb_head FROM embeddings
    )
    GROUP BY label
    """,
    doc="§2.8 array access over embedding vectors (ArrayType columns — a "
        "rebuild extension; the reference only uses transient arrays via sequence())",
)
def array_explode_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.col("embedding").getItem(0).cast("double").alias("emb_head"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("emb_head").cast("decimal(30,12)")).cast("double").alias("sum_head"),
        )
    )
