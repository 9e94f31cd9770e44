"""Observation-API quality report: same numbers as an explicit rollup,
collected as a side effect of the pipeline's own action."""

from __future__ import annotations

from pyspark.sql import functions as F

from bakery_big_data_spark.pipeline.medallion import bronze_events, event_rules
from bakery_big_data_spark.quality import apply_quality_rules, observe_quality


def test_observe_matches_explicit_rollup(spark, sf_dir):
    scored = apply_quality_rules(bronze_events(spark, sf_dir), event_rules())
    observed, obs = observe_quality(scored)
    observed.write.format("noop").mode("overwrite").save()  # the only action
    got = obs.get

    expect = scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("data_quality_score").alias("avg_score"),
        F.sum(F.when(F.col("data_quality_score") == 100, 1).otherwise(0)).alias("n_perfect"),
        F.sum(F.when(F.col("data_quality_score") < 50, 1).otherwise(0)).alias("n_poor"),
    ).first()
    assert got["n_rows"] == expect["n_rows"]
    assert abs(got["avg_score"] - expect["avg_score"]) < 1e-9
    assert got["n_perfect"] == expect["n_perfect"]
    assert got["n_poor"] == expect["n_poor"]
    assert got["n_poor"] > 0  # the gate has real work to do on this data


def test_config_surface_thresholds_and_sql_render(spark):
    """Rule sets and gate thresholds are config, not constants: the same
    dict drives rules_from_config (Spark) and config_score_sql (oracle),
    and thresholds fall back to the reference's documented defaults
    (promote >= 50: silver_to_gold.py:298; pipeline gate 80:
    bakery_batch_etl.py:54-62)."""
    from bakery_big_data_spark.quality import (
        DEFAULT_PIPELINE_GATE,
        DEFAULT_PROMOTE_THRESHOLD,
        config_score_sql,
        pipeline_gate_threshold,
        promote_threshold,
        rules_from_config,
    )

    cfg = {
        "rules": [
            {"name": "a", "predicate": "x > 0", "penalty": 30},
            {"name": "b", "predicate": "y IS NOT NULL", "penalty": 20},
        ],
        "promote_threshold": 80,
    }
    rules = rules_from_config(cfg)
    assert [r.name for r in rules] == ["a", "b"]
    assert [r.penalty for r in rules] == [30, 20]
    sql = config_score_sql(cfg)
    assert "100" in sql and "(x > 0)" in sql and "ELSE 30" in sql
    assert "(y IS NOT NULL)" in sql and "ELSE 20" in sql
    assert promote_threshold(cfg) == 80  # non-default override
    assert pipeline_gate_threshold(cfg) == DEFAULT_PIPELINE_GATE == 80
    assert promote_threshold({}) == DEFAULT_PROMOTE_THRESHOLD == 50


def test_configured_score_matches_duckdb_on_rows(spark):
    """The Spark rule fold and the SQL render score identical rows for a
    non-default config (dict-driven parameterization end-to-end)."""
    import duckdb

    from bakery_big_data_spark.quality import (
        apply_quality_rules,
        config_score_sql,
        rules_from_config,
        score_and_gate,
    )

    cfg = {
        "rules": [
            {"name": "pos", "predicate": "v > 0", "penalty": 25},
            {"name": "small", "predicate": "v < 10", "penalty": 35},
        ],
        "promote_threshold": 70,
    }
    df = spark.createDataFrame([(i,) for i in range(-2, 14)], ["v"])
    scored = {
        r["v"]: r["data_quality_score"]
        for r in apply_quality_rules(df, rules_from_config(cfg)).collect()
    }
    con = duckdb.connect()
    oracle = {
        v: s
        for v, s in con.execute(
            f"SELECT v, {config_score_sql(cfg)} AS s FROM "
            f"(SELECT unnest(range(-2, 14)) AS v)"
        ).fetchall()
    }
    assert scored == oracle
    # non-default promote threshold gates at 70: only double-failures drop
    kept = {r["v"] for r in score_and_gate(df, cfg).collect()}
    assert kept == {v for v, s in scored.items() if s >= 70}


def test_configured_gate_is_batch_global(spark, sf_dir):
    """ADVICE r09: the reference's pipeline gate short-circuits on the
    avg over the WHOLE batch (bakery_batch_etl.py:54-62), so every group
    row must carry the SAME gate flag — the one a global aggregate of the
    scored frame produces — not a per-group decision."""
    from bakery_big_data_spark.plans.relational import (
        CONFIGURED_QUALITY,
        quality_configured_gate,
    )
    from bakery_big_data_spark.quality import (
        apply_quality_rules,
        pipeline_gate_threshold,
        rules_from_config,
    )
    from bakery_big_data_spark.plans.base import t
    from pyspark.sql import functions as F

    rows = quality_configured_gate(spark, sf_dir).collect()
    flags = {r["pipeline_gate_pass"] for r in rows}
    assert len(flags) == 1, f"gate must be batch-global, got {flags}"

    scored = apply_quality_rules(
        t(spark, sf_dir, "lineitem"), rules_from_config(CONFIGURED_QUALITY)
    )
    batch_avg = scored.agg(
        (F.sum(F.col("data_quality_score").cast("decimal(30,6)")).cast("double")
         / F.count("data_quality_score")).alias("a")
    ).collect()[0]["a"]
    expected = batch_avg >= pipeline_gate_threshold(CONFIGURED_QUALITY)
    assert flags == {expected}
