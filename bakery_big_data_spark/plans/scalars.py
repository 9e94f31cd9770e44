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
    "date_functions_calendar",
    """
    SELECT CAST(d AS DATE) AS calendar_date,
           EXTRACT(day FROM d) AS day_of_month,
           EXTRACT(month FROM d) AS month_num,
           quarter(d) AS quarter_num,
           EXTRACT(year FROM d) AS year_num,
           dayname(d) AS weekday_name,
           monthname(d) AS month_name,
           CASE WHEN dayname(d) IN ('Saturday','Sunday') THEN TRUE ELSE FALSE END AS is_weekend,
           CASE
             WHEN EXTRACT(month FROM d) IN (12,1,2) THEN 'winter'
             WHEN EXTRACT(month FROM d) IN (3,4,5) THEN 'spring'
             WHEN EXTRACT(month FROM d) IN (6,7,8) THEN 'summer'
             ELSE 'autumn'
           END AS season,
           CAST(d - INTERVAL 30 DAY AS DATE) AS lookback_30d,
           CAST(d + INTERVAL 7 DAY AS DATE) AS due_date,
           date_diff('day', CAST(d AS DATE), DATE '2024-12-31') AS days_to_eoy,
           last_day(CAST(d AS DATE)) AS month_end,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           epoch_us(CAST(d AS TIMESTAMP)) AS epoch_us
    FROM (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS d
    )
    """,
    doc="§2.8 calendar dimension end to end: sequence(start, end, interval "
        "1 day) + explode generation (reference silver_to_gold.py:44-46), "
        "date-part derivations dayofmonth/month/quarter/year + "
        "date_format EEEE/MMMM + weekend/season case ladders "
        "(silver_to_gold.py:44-64), and date arithmetic "
        "date_sub/date_add/datediff/last_day/trunc/unix-epoch "
        "(silver_to_gold.py:184,251,264; update_ml_features.py:238,254; "
        "bronze_to_silver.py:200) — one generated frame, map-only",
)
def date_functions_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = spark.sql(
        "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-12-31', interval 1 day)) AS d"
    )
    d = F.col("d")
    month = F.month(d)
    weekday = F.date_format(d, "EEEE")
    return cal.select(
        d.alias("calendar_date"),
        F.dayofmonth(d).alias("day_of_month"),
        month.alias("month_num"),
        F.quarter(d).alias("quarter_num"),
        F.year(d).alias("year_num"),
        weekday.alias("weekday_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        weekday.isin("Saturday", "Sunday").alias("is_weekend"),
        F.when(month.isin(12, 1, 2), "winter")
        .when(month.isin(3, 4, 5), "spring")
        .when(month.isin(6, 7, 8), "summer")
        .otherwise("autumn")
        .alias("season"),
        F.date_sub(d, 30).alias("lookback_30d"),
        F.date_add(d, 7).alias("due_date"),
        F.datediff(F.lit("2024-12-31").cast("date"), d).cast("bigint").alias("days_to_eoy"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        # session tz is pinned to UTC (tune()), so the timestamp cast makes
        # unix_micros agree with DuckDB's naive epoch_us.
        F.unix_micros(d.cast("timestamp")).alias("epoch_us"),
    )


@register(
    "string_math_functions",
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
           regexp_extract(c_name, '([0-9]+)', 1) AS key_digits,
           abs(c_acctbal - 1000.0) AS bal_deviation,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 5000.0) AS bal_cap5000,
           greatest(least(c_acctbal * 2.5, 5000.0), 0.0) AS bal_clamped,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           -- squared as MULTIPLICATION on both sides: pow(x, 2) is not
           -- bit-stable cross-engine (DuckDB's power() returns the
           -- correctly-rounded libm value, Spark/Java's the x*x double —
           -- they differ by 1 ulp on e.g. 3046.44, found in the r07
           -- sf0.1 cross-check); IEEE multiply is identical everywhere
           c_acctbal * c_acctbal AS bal_sq,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           CAST(sign(c_acctbal - 1000.0) AS BIGINT) AS bal_sign,
           mod(c_custkey, 7) AS key_mod7
    FROM customer
    WHERE c_custkey <= 500
    """,
    doc="§2.8 string + math functions in one map-only pass: "
        "concat/concat_ws/upper/lower/substring/length/trim/lpad/replace/"
        "regexp_extract (reference silver_to_gold.py:257-258, "
        "update_ml_features.py:140,251,302-303, load_bronze_from_csv.py:7) "
        "and abs/greatest/least/clamp/sqrt/pow/floor/ceil/sign/mod "
        "(silver_to_gold.py:392-395 efficiency clamp, "
        "update_ml_features.py:263-269 probability cap, silver_to_gold.py:211)",
)
def string_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    bal = F.col("c_acctbal")
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
        F.abs(bal - 1000.0).alias("bal_deviation"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(5000.0)).alias("bal_cap5000"),
        F.greatest(F.least(bal * 2.5, F.lit(5000.0)), F.lit(0.0)).alias("bal_clamped"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (bal * bal).alias("bal_sq"),  # not F.pow — see the oracle comment
        # Engine-stable integer widths on both sides: Spark floor/ceil yield
        # BIGINT natively (DuckDB's yield DOUBLE → oracle casts), and signum
        # yields DOUBLE (DuckDB sign yields TINYINT → both cast to BIGINT).
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.signum(bal - 1000.0).cast("bigint").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
    )


@register(
    "json_payload_roundtrip",
    """
    SELECT event_id,
           event_type,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 'high' ELSE 'low' END AS k_band,
           to_json(struct_pack(
             event_type := event_type,
             user_id := user_id,
             k := CAST(json_extract_string(props, '$.k') AS INT)
           )) AS payload_json
    FROM events
    """,
    doc="§2.8 JSON both directions in one map-only pass: unpack of the "
        "semi-structured payload column (reference stream_to_bronze.py:59,"
        "107,112 from_json; init_iceberg_tables.py:94 raw_payload STRING) "
        "plus struct→JSON re-assembly (load_bronze_from_csv.py:84-96,117-125)",
)
def json_payload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.cast("int") >= 50, "high").otherwise("low").alias("k_band"),
        F.to_json(
            F.struct(
                F.col("event_type").alias("event_type"),
                F.col("user_id").alias("user_id"),
                k.cast("int").alias("k"),
            )
        ).alias("payload_json"),
    )


@register(
    "array_explode_aggregate",
    """
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(FLOOR(emb_head * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12 AS sum_head
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
            # floor-quantize before the cross-row sum: float32 doubles can
            # tie EXACTLY at the 1e-12 decimal midpoint, where Spark's
            # half-up and DuckDB's half-even DECIMAL rounding diverge
            # (see embedding_label_centroids)
            (
                F.sum(F.floor(F.col("emb_head") * 1e12).cast("bigint"))
                .cast("double")
                / F.lit(1e12)
            ).alias("sum_head"),
        )
    )


@register(
    "json_variant_shred",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max,
           COUNT(*) - COUNT(CAST(json_extract(props, '$.k') AS BIGINT))
             AS n_missing
    FROM events
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion path: semi-structured payloads parsed "
        "ONCE into the binary variant encoding (parse_json) and shredded "
        "with typed path extraction (try_variant_get '$.k' → BIGINT) — the "
        "modern replacement for per-query from_json with a full schema "
        "when payloads are heterogeneous; at 100 TB the variant binary "
        "beats re-tokenizing JSON text per access and missing paths "
        "surface as NULLs (n_missing) instead of schema errors.  One "
        "map-side-combinable aggregation",
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    shredded = ev.select("event_type", k.alias("k"))
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        (F.count(F.lit(1)) - F.count("k")).alias("n_missing"),
    )
