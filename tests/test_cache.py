"""PlanCache behavior: LRU eviction unpersists, hits don't rebuild, and
entries are invisible to a different session identity (operators/cache.py;
round-2 ADVICE on _IVF_INDEX_CACHE/_SHINGLE_CACHE leaks)."""

from __future__ import annotations

from bakery_big_data_spark.operators.cache import PlanCache


def _persisted(spark, n):
    return spark.range(n).persist()


def test_lru_evicts_and_unpersists(spark):
    cache = PlanCache(max_entries=2)
    a = cache.get_or_build(spark, ("sf_a",), lambda: _persisted(spark, 10))
    b = cache.get_or_build(spark, ("sf_b",), lambda: _persisted(spark, 20))
    assert a.storageLevel.useMemory and b.storageLevel.useMemory

    # third scale factor evicts the least-recently-used entry AND unpersists
    c = cache.get_or_build(spark, ("sf_c",), lambda: _persisted(spark, 30))
    assert not a.storageLevel.useMemory, "evicted frame must be unpersisted"
    assert b.storageLevel.useMemory and c.storageLevel.useMemory
    assert len(cache) == 2


def test_hit_returns_same_object_without_rebuild(spark):
    cache = PlanCache(max_entries=2)
    builds = []

    def build():
        builds.append(1)
        return _persisted(spark, 5)

    first = cache.get_or_build(spark, ("k",), build)
    second = cache.get_or_build(spark, ("k",), build)
    assert first is second
    assert len(builds) == 1
    cache.clear()
    assert not first.storageLevel.useMemory
    assert len(cache) == 0


def test_tuple_values_unpersist_contained_frames(spark):
    # IVF cache shape: (assigned DataFrame, centers list)
    cache = PlanCache(max_entries=1)
    df = _persisted(spark, 7)
    cache.get_or_build(spark, ("ivf",), lambda: (df, [[0.0, 1.0]]))
    cache.get_or_build(spark, ("other",), lambda: (_persisted(spark, 3), []))
    assert not df.storageLevel.useMemory


def test_shared_artifacts_memoized_across_rows(spark, sf_dir):
    """The cross-row shared frames (BPE artifacts, BM25 scored, the
    semantic-dedup pair frames, the trained logit weights) must be the
    SAME object on a second build — identity is the contract that the
    expensive stage runs once per (session, sf)."""
    from bakery_big_data_spark.plans.extended import _logit_trained
    from bakery_big_data_spark.plans.similarity import (
        _semdedup_pairs_045,
        _truth_pairs_045,
    )
    from bakery_big_data_spark.plans.textops import _bm25_scored, _bpe_artifacts

    for fn in (
        _bm25_scored,
        _truth_pairs_045,
        _semdedup_pairs_045,
    ):
        assert fn(spark, sf_dir) is fn(spark, sf_dir), fn.__name__
    m1, v1 = _bpe_artifacts(spark, sf_dir)
    m2, v2 = _bpe_artifacts(spark, sf_dir)
    assert m1 is m2 and v1 is v2
    xs1, r1 = _logit_trained(spark, sf_dir)
    xs2, r2 = _logit_trained(spark, sf_dir)
    assert xs1 is xs2 and r1 is r2
    # the weights frame is persisted so the 8 GD passes execute once
    assert r1.storageLevel.useMemory
