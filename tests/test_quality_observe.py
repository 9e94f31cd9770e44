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
