"""Data-quality scoring engine — the reference's signature reusable operator.

Semantics (reference ``processing/jobs/bronze_to_silver.py:23-33``): start
every row at score 100; for each named rule ``(name, predicate, penalty)``
subtract ``penalty`` where the predicate FAILS, and materialize a boolean
``dq_check_<name>`` column recording the outcome.  Downstream layers gate on
``data_quality_score >= threshold`` (reference ``silver_to_gold.py:298``:
threshold 50).

Implementation is a pure ``when/otherwise`` fold — rules are data, the whole
thing stays inside whole-stage codegen, no UDFs, scales linearly with rows
and is map-only (no shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityRule:
    name: str
    predicate: Column  # True == row passes the check
    penalty: int


def apply_quality_rules(
    df: DataFrame,
    rules: list[QualityRule],
    score_col: str = "data_quality_score",
    check_prefix: str = "dq_check_",
) -> DataFrame:
    """Score rows against a rule list (reference bronze_to_silver.py:23-33).

    A NULL predicate result counts as a failure (the reference's boolean
    columns behave the same way once gated with ``>=``), so predicates are
    null-guarded with ``coalesce(pred, false)``.
    """
    score: Column = F.lit(100)
    checks: dict[str, Column] = {}
    for rule in rules:
        passed = F.coalesce(rule.predicate, F.lit(False))
        checks[check_prefix + rule.name] = passed
        score = score - F.when(~passed, F.lit(rule.penalty)).otherwise(F.lit(0))
    out = df
    for name, col in checks.items():
        out = out.withColumn(name, col)
    return out.withColumn(score_col, score.cast("int"))


def quality_gate(df: DataFrame, threshold: int = 50, score_col: str = "data_quality_score") -> DataFrame:
    """Promote-or-quarantine filter (reference silver_to_gold.py:298,343,384)."""
    return df.filter(F.col(score_col) >= threshold)


def observe_quality(
    df: DataFrame, name: str = "quality", score_col: str = "data_quality_score"
):
    """Attach the quality report as zero-cost pipeline instrumentation.

    The reference computes its per-table quality rollup with a second scan
    (``bronze_to_silver.py:242-278``); Spark's Observation API collects the
    same metrics — row count, mean score, perfect/poor counts — as
    accumulator-style side output of whatever action the pipeline already
    runs, so at 100 TB the report costs no extra pass.

    Returns ``(observed_df, observation)``; read ``observation.get`` after
    any action on ``observed_df``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    score = F.col(score_col)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(score).alias("avg_score"),
        F.sum(F.when(score == 100, 1).otherwise(0)).alias("n_perfect"),
        F.sum(F.when(score < 50, 1).otherwise(0)).alias("n_poor"),
    )
    return observed, obs


# ---------------------------------------------------------------------------
# Config surface: rule sets and gate thresholds as DATA (dict in, report out)
# ---------------------------------------------------------------------------
# The reference parameterizes its gates at two levels — the row-level
# promote filter (silver_to_gold.py:298: score >= 50) and the
# pipeline-level quality gate (orchestration/dags/bakery_batch_etl.py:54-62:
# batch avg score >= 80 or the DAG short-circuits).  Both were constants in
# this engine until r09; they are now plain config, and the rule predicates
# themselves travel as portable SQL expression strings so ONE dict drives
# both the Spark plan and the DuckDB oracle.

DEFAULT_PROMOTE_THRESHOLD = 50  # reference silver_to_gold.py:298
DEFAULT_PIPELINE_GATE = 80  # reference bakery_batch_etl.py:54-62


def rules_from_config(config: dict) -> list[QualityRule]:
    """Materialize ``config["rules"]`` (name / predicate-SQL / penalty
    dicts) into :class:`QualityRule` columns.  Predicates are SQL
    expression strings (``F.expr``) so rule sets can live in JSON/YAML
    deployment config instead of code."""
    return [
        QualityRule(r["name"], F.expr(r["predicate"]), int(r["penalty"]))
        for r in config["rules"]
    ]


def config_score_sql(config: dict) -> str:
    """The same rule fold rendered as ANSI SQL — generated from the SAME
    dict as :func:`rules_from_config`, so engine and oracle can never
    drift on what the configured rules mean."""
    parts = " - ".join(
        f"(CASE WHEN COALESCE(({r['predicate']}), FALSE)"
        f" THEN 0 ELSE {int(r['penalty'])} END)"
        for r in config["rules"]
    )
    return f"CAST(100 - {parts} AS INT)"


def promote_threshold(config: dict) -> int:
    return int(config.get("promote_threshold", DEFAULT_PROMOTE_THRESHOLD))


def pipeline_gate_threshold(config: dict) -> int:
    return int(config.get("pipeline_gate", DEFAULT_PIPELINE_GATE))


def score_and_gate(df: DataFrame, config: dict) -> DataFrame:
    """Dict-driven score → promote filter (the full configured row path)."""
    scored = apply_quality_rules(df, rules_from_config(config))
    return quality_gate(scored, threshold=promote_threshold(config))


def sales_rules() -> list[QualityRule]:
    """The reference's Bronze-sales rule set (bronze_to_silver.py:45-51),
    re-keyed onto the test ``lineitem`` columns with identical shapes:
    range check, set-membership, positivity ×2, null check."""
    return [
        QualityRule("valid_quantity", (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 50), 20),
        QualityRule("valid_discount", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.5), 20),
        QualityRule("positive_price", F.col("l_extendedprice") > 0, 25),
        QualityRule("valid_returnflag", F.col("l_returnflag").isin("A", "N", "R"), 25),
        QualityRule("has_shipdate", F.col("l_shipdate").isNotNull(), 10),
    ]


def sales_rules_sql() -> str:
    """DuckDB-equivalent scoring expression for the oracle (same rule set)."""
    terms = [
        ("(l_quantity > 0 AND l_quantity <= 50)", 20),
        ("(l_discount >= 0 AND l_discount <= 0.5)", 20),
        ("(l_extendedprice > 0)", 25),
        ("(l_returnflag IN ('A','N','R'))", 25),
        ("(l_shipdate IS NOT NULL)", 10),
    ]
    parts = " - ".join(
        f"(CASE WHEN COALESCE({pred}, FALSE) THEN 0 ELSE {pen} END)" for pred, pen in terms
    )
    return f"CAST(100 - {parts} AS INT)"
