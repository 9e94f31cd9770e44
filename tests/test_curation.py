"""Behavioral tests for the dataset-curation family (plans/curation.py).

The DuckDB value-hash check lives in tests/test_catalog.py; these assert the
curation-specific invariants the oracle can't express: split determinism and
proportions, benchmark/corpus disjointness, and funnel monotonicity.
"""

from __future__ import annotations

from bakery_big_data_spark.plans import REGISTRY


def test_hash_split_deterministic_and_proportioned(spark, sf_dir):
    q = REGISTRY["curation_hash_split"]
    rows = {r.doc_id: r.split for r in q.build(spark, sf_dir).collect()}
    again = {r.doc_id: r.split for r in q.build(spark, sf_dir).collect()}
    assert rows == again  # pure function of the key

    n = len(rows)
    counts = {s: sum(1 for v in rows.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == n
    # 80/10/10 targets; multiplicative-hash uniforms at n=500 land within ±6%.
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts["val"] / n - 0.1) < 0.06
    assert abs(counts["test"] / n - 0.1) < 0.06


def test_contamination_excludes_benchmark_and_bounds(spark, sf_dir):
    df = REGISTRY["curation_contamination_check"].build(spark, sf_dir)
    rows = df.collect()
    assert all(r.doc_id % 25 != 0 for r in rows)  # corpus only
    assert all(0.0 <= r.contamination_ratio <= 1.0 for r in rows)
    assert all(r.n_shared <= r.n_grams for r in rows)
    # The shared 30-word vocabulary guarantees trigram collisions exist.
    assert any(r.n_shared > 0 for r in rows)


def test_filter_funnel_monotone(spark, sf_dir):
    r = REGISTRY["curation_filter_funnel"].build(spark, sf_dir).collect()[0]
    assert r.n_total >= r.n_len >= r.n_len_ttr >= r.n_len_ttr_lang >= 0
    assert 0 < r.n_len_ttr_lang < r.n_total  # thresholds are non-degenerate
    assert abs(r.retention - r.n_len_ttr_lang / r.n_total) < 1e-12
