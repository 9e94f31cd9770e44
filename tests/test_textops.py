"""Edge-case tests for the text-analysis family.

The catalog test covers the happy path against DuckDB; these cover inputs
the current testdata never produces (short/empty/null documents) so a
driver testdata regeneration can't crash the bigram queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bakery_big_data_spark.plans.textops import _adjacent_pairs


def test_adjacent_pairs_short_and_null_docs(spark):
    """A 1-token, empty, or NULL document yields zero pairs instead of
    tripping Spark's descending sequence(1, 0) → element_at(ws, 0) error
    (DuckDB's generate_series(1, 0) is empty, so both engines must agree)."""
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",), (None,)], "text string"
    ).select(F.split("text", " ").alias("ws"))
    rows = (
        df.select(F.explode(_adjacent_pairs("ws")).alias("g"))
        .select("g.w1", "g.w2")
        .collect()
    )
    assert sorted((r.w1, r.w2) for r in rows) == [("a", "b"), ("b", "c")]


def test_bm25_retrieved_docs_contain_a_query_term(spark, sf_dir):
    """Every retrieved doc must share at least one term with its query
    (inverted-index candidate semantics), ranks are 1..5 without gaps, and
    scores are non-increasing within a query."""
    from pyspark.sql import functions as F

    from bakery_big_data_spark.plans import REGISTRY

    rows = REGISTRY["text_bm25_retrieval"].build(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_source"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(1 <= r["n_terms"] <= 3 for r in rs)


def test_perplexity_filter_gate_bites(spark, sf_dir):
    """The keep floor must split the held-out corpus non-trivially (a gate
    that keeps or drops everything certifies nothing), and trigram-less
    docs must surface with score 0 / dropped rather than vanish."""
    from bakery_big_data_spark.plans import REGISTRY

    rows = REGISTRY["text_perplexity_filter"].build(spark, sf_dir).collect()
    kept = sum(1 for r in rows if r.is_kept)
    assert 0 < kept < len(rows)
    # every held-out doc is present exactly once
    from pyspark.sql import functions as F
    from bakery_big_data_spark.plans.base import t

    n_held = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )
    assert len(rows) == n_held
    for r in rows:
        if r.n_trigrams == 0:
            assert r.lm_score == 0.0 and not r.is_kept
