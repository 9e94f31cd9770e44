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
