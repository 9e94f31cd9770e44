"""Unit tests for the portable Bloom filter (operators/sketches.py) —
the semi-join-reduction sketch: no false negatives ever, mergeability
(word-wise OR of two builds == build of the concatenated streams), and
probe-side plan shape (broadcast join, no probe shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_no_false_negatives_and_some_positives(spark):
    from bakery_big_data_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    df = spark.createDataFrame([(i,) for i in range(3000)], "k LONG")
    members = df.filter(F.col("k") % 3 == 0)
    bl = bloom_build(members, "k")
    got = {r.k: r.in_bloom for r in bloom_probe(df, bl, "k").collect()}
    assert all(got[k] for k in range(0, 3000, 3)), "false negative"
    # at 1000 keys / 32256 bits / 6 hashes the fp rate is ~0.2% — tiny
    # but nonzero expectation; assert only the one-sided contract here
    fps = sum(1 for k in range(3000) if k % 3 != 0 and got[k])
    assert fps < 200  # far below saturation


def test_bloom_merge_equals_concatenated_build(spark):
    """Word-wise OR of two builds must equal one build over the union —
    the mergeability that lets per-partition/per-day filters combine
    without re-reading history (same contract as the CMS/HLL rows)."""
    from bakery_big_data_spark.operators.sketches import bloom_build

    a = spark.createDataFrame([(i,) for i in range(0, 500)], "k LONG")
    b = spark.createDataFrame([(i,) for i in range(400, 900)], "k LONG")
    merged = (
        bloom_build(a, "k")
        .unionByName(bloom_build(b, "k"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bloom_duplicates_are_free(spark):
    """OR idempotence: building over a stream with duplicates equals
    building over the distinct keys — no DISTINCT pass needed."""
    from bakery_big_data_spark.operators.sketches import bloom_build

    keys = spark.createDataFrame([(i % 50,) for i in range(1000)], "k LONG")
    dup = bloom_build(keys, "k")
    dist = bloom_build(keys.distinct(), "k")
    assert sorted(map(tuple, dup.collect())) == sorted(
        map(tuple, dist.collect())
    )


def test_bloom_probe_is_broadcast_join(spark, sf_dir):
    """The probe side must never shuffle: the filter is broadcast and the
    membership check is map-side (the property that makes Bloom pruning
    worth shipping at 100 TB)."""
    from bakery_big_data_spark.plans import REGISTRY

    df = REGISTRY["sketch_bloom_semijoin"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_kmv_small_side_is_exact(spark):
    from bakery_big_data_spark.operators.sketches import (
        kmv_estimate,
        kmv_side_sketches,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(7)],
        "side string, uid long",
    )
    sk = kmv_side_sketches(df, "side", "uid", k=64)
    got = {r["side"]: r["arr"] for r in sk.collect()}
    assert len(got["a"]) == 5 and got["a"] == sorted(got["a"])
    assert len(got["b"]) == 7
    est = {
        r["side"]: r["e"]
        for r in sk.select(
            "side", kmv_estimate(F.col("arr"), 64).alias("e")
        ).collect()
    }
    assert est == {"a": 5.0, "b": 7.0}  # below k the sketch IS the set


def test_kmv_sketch_is_mergeable(spark):
    """bottom-k of two sides' sketches == bottom-k of the pooled keys —
    the property that makes per-day sketches combinable."""
    from bakery_big_data_spark.operators.sketches import kmv_side_sketches
    from pyspark.sql import functions as F

    k = 8
    rows = [("a", i) for i in range(0, 200, 2)] + [
        ("b", i) for i in range(0, 300, 3)
    ]
    df = spark.createDataFrame(rows, "side string, uid long")
    per_side = {
        r["side"]: r["arr"]
        for r in kmv_side_sketches(df, "side", "uid", k=k).collect()
    }
    merged = sorted(set(per_side["a"]) | set(per_side["b"]))[:k]
    pooled = kmv_side_sketches(
        df.select(F.lit("all").alias("side"), "uid"), "side", "uid", k=k
    ).collect()[0]["arr"]
    assert merged == list(pooled)


def test_kmv_estimator_within_bound(spark):
    """k=64 over 1000 distinct keys: relative error should be well inside
    ~3/sqrt(k) (~38%) — a loose but meaningful sanity band."""
    from bakery_big_data_spark.operators.sketches import (
        kmv_estimate,
        kmv_side_sketches,
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.lit("s").alias("side"), F.col("id").alias("uid")
    )
    est = (
        kmv_side_sketches(df, "side", "uid", k=64)
        .select(kmv_estimate(F.col("arr"), 64).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - 1000) / 1000 < 0.38


def test_bottomk_quantile_sample_is_mergeable(spark, sf_dir):
    """Bottom-k-by-hash row sampling must be mergeable: the bottom-k of
    the full corpus equals the bottom-k of the union of per-half
    bottom-ks — the property that makes the quantile sketch a sketch
    (per-partition/day samples fold without revisiting rows)."""
    from bakery_big_data_spark.operators.sketches import kmv_hash60
    from bakery_big_data_spark.plans.base import t
    from pyspark.sql import functions as F

    k = 64
    ev = t(spark, sf_dir, "events").select(
        kmv_hash60(F.col("event_id").cast("string")).alias("h"), "value"
    )

    def bottomk(df):
        return sorted(
            ((r["h"], r["value"]) for r in df.collect())
        )[:k]

    whole = bottomk(ev)
    lo = bottomk(ev.filter(F.pmod("h", F.lit(2)) == 0))
    hi = bottomk(ev.filter(F.pmod("h", F.lit(2)) == 1))
    assert sorted(lo + hi)[:k] == whole


def test_bottomk_quantiles_within_dkw(spark, sf_dir):
    """On the shipped corpora the k=256 sample's rank error sits inside
    the DKW(0.05) bound for every target quantile (deterministic given
    the fixed hash — re-pin if the generator changes)."""
    from bakery_big_data_spark.plans import REGISTRY

    rows = REGISTRY["sketch_bottomk_quantiles"].build(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["rank_err"] <= r["dkw_eps"], (r["quantile"], r["rank_err"])
        assert r["within_dkw"]
