"""Property-based tests (hypothesis) for the operators whose correctness is
easiest to state as an invariant: as-of join vs a naive reference
implementation, quality-score arithmetic, upsert idempotency."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.asof import asof_join
from bakery_big_data_spark.operators.mutation import merge_upsert_when_newer
from bakery_big_data_spark.quality import QualityRule, apply_quality_rules

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,  # fixed example stream — no run-to-run flakiness
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

key_ts = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=100),  # ts
)


@given(
    left=st.lists(key_ts, min_size=1, max_size=12),
    right=st.lists(key_ts, min_size=0, max_size=12),
)
@SETTINGS
def test_asof_join_matches_naive(spark, left, right):
    # deduplicate right to one row per (key, ts): payload = ts * 10
    right = sorted({(k, ts) for k, ts in right})
    left_rows = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    right_rows = [(k, ts, ts * 10) for k, ts in right]
    ldf = spark.createDataFrame(left_rows, "lid LONG, k LONG, ts LONG")
    rdf = spark.createDataFrame(
        right_rows or [(None, None, None)], "k LONG, rts LONG, payload LONG"
    ).filter(F.col("k").isNotNull())
    out = asof_join(ldf, rdf, key="k", left_ts="ts", right_ts="rts",
                    payload_cols=["payload"])
    got = {r.lid: r.payload for r in out.collect()}
    for lid, k, ts in left_rows:
        matches = [rts for rk, rts in right if rk == k and rts <= ts]
        expect = max(matches) * 10 if matches else None
        assert got[lid] == expect, (lid, k, ts, got[lid], expect)


@given(
    vals=st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=8),
    p1=st.integers(min_value=1, max_value=50),
    p2=st.integers(min_value=1, max_value=50),
)
@SETTINGS
def test_quality_score_arithmetic(spark, vals, p1, p2):
    df = spark.createDataFrame([(v,) for v in vals], "x LONG")
    rules = [
        QualityRule("positive", F.col("x") > 0, p1),
        QualityRule("even", F.col("x") % 2 == 0, p2),
    ]
    out = apply_quality_rules(df, rules).collect()
    for r in out:
        expect = 100 - (0 if r.x > 0 else p1) - (0 if r.x % 2 == 0 else p2)
        assert r.data_quality_score == expect
        assert r.dq_check_positive == (r.x > 0)


@given(
    target=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 20)), min_size=1, max_size=8
    ),
    source=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 20)), min_size=1, max_size=8
    ),
)
@SETTINGS
def test_upsert_idempotent(spark, target, source):
    # unique keys per frame, deterministic recency
    tgt = {k: ts for k, ts in target}
    src = {k: ts for k, ts in source}
    tdf = spark.createDataFrame(list(tgt.items()), "k LONG, etl LONG")
    sdf = spark.createDataFrame(list(src.items()), "k LONG, etl LONG")
    once = merge_upsert_when_newer(tdf, sdf, ["k"], "etl")
    twice = merge_upsert_when_newer(once, sdf, ["k"], "etl")
    a = sorted((r.k, r.etl) for r in once.collect())
    b = sorted((r.k, r.etl) for r in twice.collect())
    assert a == b
    # winner law: max(etl) per key with target preference on ties
    for k, etl in a:
        t_ts, s_ts = tgt.get(k), src.get(k)
        if t_ts is None:
            assert etl == s_ts
        elif s_ts is None:
            assert etl == t_ts
        else:
            assert etl == (s_ts if s_ts > t_ts else t_ts)


def test_scalable_prefix_sum_matches_window(spark, sf_dir):
    """add_prefix_sum (range-partitioned decomposition) must equal the
    plain single-partition window cumsum exactly, at any partition count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.keys import add_prefix_sum
    from bakery_big_data_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.doc_id, r.cw)
        for r in d.withColumn(
            "cw", F.sum("n_chars").over(w).cast("bigint")
        ).collect()
    }
    for parts in (3, 16):
        got = {
            (r.doc_id, r.cw)
            for r in add_prefix_sum(
                d, "lang", ["doc_id"], "n_chars", "cw", num_partitions=parts
            ).collect()
        }
        assert got == expected


def test_prefix_sum_decimal_total_col_exact(spark, sf_dir):
    """r14: out_type=None keeps the native DECIMAL running-sum type and
    total_col attaches the group grand total — both must be bit-identical
    to the single-partition window forms (decimal addition is exact and
    associative, so the decomposition cannot drift)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.keys import add_prefix_sum
    from bakery_big_data_spark.sources.tables import load_table

    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.lit(0).alias("g"),
            F.col("o_totalprice").cast("decimal(30,6)").alias("v"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    expected = {
        (r.o_orderkey, str(r.cum), str(r.tot))
        for r in d.select(
            "o_orderkey",
            F.sum("v").over(w).alias("cum"),
            F.sum("v").over(wt).alias("tot"),
        ).collect()
    }
    got_df = add_prefix_sum(
        d,
        "g",
        ["o_orderkey"],
        "v",
        "cum",
        num_partitions=7,
        out_type=None,
        total_col="tot",
    )
    got = {
        (r.o_orderkey, str(r.cum), str(r.tot)) for r in got_df.collect()
    }
    assert got == expected


def test_scalable_ntile_small_n_and_convergence_guard(spark, sf_dir):
    """n < k: each row gets its own bucket (SQL NTILE semantics); and
    connected_components raises rather than silently returning
    unconverged labels when max_iter is below the graph diameter."""
    import pytest
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.dedup import connected_components
    from bakery_big_data_spark.operators.keys import scalable_ntile

    small = spark.range(3).select(F.col("id").alias("k"))
    got = {
        (r.k, r.ntile)
        for r in scalable_ntile(small, ["k"], 5, "ntile").collect()
    }
    assert got == {(0, 1), (1, 2), (2, 3)}

    # a 6-node path graph has diameter 5: max_iter=2 cannot converge
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["id_a", "id_b"]
    )
    nodes = spark.range(6).select(F.col("id").alias("node"))
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(nodes, chain, "node", max_iter=2)


def test_scalable_ntile_bucket_invariants_stress(spark, sf_dir):
    """Regression for the range-boundary race (r07): add_surrogate_key's
    counts branch and local-rank branch each used to instantiate their own
    RangePartitioner — independently SAMPLED split points — so when
    exchange reuse didn't deduplicate them the offsets belonged to a
    different partitioning than the row_numbers (observed as NTILE(5)
    emitting bucket 6).  The operator now persists the ranged frame, so a
    single partitioner feeds both branches.  Assert the closed-form
    invariants that the race violated, on a real-sized frame, repeatedly:
    every bucket in 1..k, bucket sizes differing by at most 1 with larger
    buckets first, sizes summing to n."""
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.keys import scalable_ntile
    from bakery_big_data_spark.sources.tables import load_table

    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    k = 5
    for _ in range(3):
        sizes = {
            r.ntile: r.n
            for r in scalable_ntile(
                per_cust, [F.col("freq").desc(), F.col("o_custkey")], k, "ntile"
            )
            .groupBy("ntile")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n = sum(sizes.values())
        assert set(sizes) <= set(range(1, k + 1)), sizes
        q, m = divmod(n, k)
        expected = {
            b: (q + 1 if b <= m else q) for b in range(1, k + 1) if q or b <= m
        }
        assert sizes == expected, (sizes, expected)


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=30),
    k=st.integers(1, 7),
)
@SETTINGS
def test_scalable_ntile_matches_builtin(spark, vals, k):
    """The closed-form range-decomposed NTILE must equal Spark's built-in
    NTILE on arbitrary data, bucket counts, and tie patterns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.keys import scalable_ntile

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid LONG, v LONG")
    w = Window.orderBy("v", "rid")
    expected = {
        (r.rid, r.nt)
        for r in df.select("rid", F.ntile(k).over(w).alias("nt")).collect()
    }
    got = {
        (r.rid, r.ntile)
        for r in scalable_ntile(df, ["v", "rid"], k, num_partitions=3).collect()
    }
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),  # (group, weight)
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
def test_scalable_prefix_sum_matches_window_hypothesis(spark, rows):
    """Arbitrary groups/weights: the range-decomposed prefix sum equals the
    plain window cumsum at a fixed 3-partition decomposition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.keys import add_prefix_sum

    data = [(i, g, w) for i, (g, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid LONG, g LONG, w LONG")
    win = (
        Window.partitionBy("g")
        .orderBy("rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.rid, r.cw)
        for r in df.withColumn("cw", F.sum("w").over(win).cast("bigint")).collect()
    }
    got = {
        (r.rid, r.cw)
        for r in add_prefix_sum(
            df, "g", ["rid"], "w", "cw", num_partitions=3
        ).collect()
    }
    assert got == expected


def test_misra_gries_contract_partition_invariant(spark, sf_dir):
    """The MG CONTRACT must hold under any partitioning (summary CONTENT may
    differ — that's the algorithm, not a bug): size <= k, est <= true for
    every surviving key, true - est <= N/(k+1) for EVERY key (absent keys
    read est = 0), and every key above N/(k+1) present.  k = 8 on the
    sentinel-collapsed event key stresses heavy truncation (cardinality is
    hundreds)."""
    from bakery_big_data_spark.operators.sketches import misra_gries_summary

    k = 8
    keyed = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.when(F.col("value") < 50, F.col("event_type"))
            .otherwise(
                F.concat_ws(
                    ":", F.col("event_type"), F.col("user_id").cast("string")
                )
            )
            .alias("g")
        )
    )
    exact = {
        r["g"]: r["c"]
        for r in keyed.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    bound = n / (k + 1)
    for parts in (1, 3, 13):
        summary = {
            r["g"]: r["cnt"]
            for r in misra_gries_summary(
                keyed.repartition(parts), "g", k
            ).collect()
        }
        assert len(summary) <= k, (parts, len(summary))
        for g, est in summary.items():
            assert est <= exact[g], (parts, g)
        for g, true in exact.items():
            est = summary.get(g, 0)
            assert true - est <= bound, (parts, g, true, est)
            if true > bound:
                assert g in summary, (parts, g)


def test_logistic_gd_matches_numpy_reference(spark, sf_dir):
    """The distributed 8-round GD must be BIT-IDENTICAL to a single-machine
    numpy fold running the same update rule with the same int64 floor
    quantizers — per-row IEEE ops and exact integer sums leave no room for
    'close enough'."""
    import numpy as np

    from bakery_big_data_spark.plans import REGISTRY

    row = REGISTRY["ml_logistic_classifier_gd"].build(spark, sf_dir).collect()[0]

    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_extendedprice", "l_discount")
        .toPandas()
    )
    q = pdf["l_extendedprice"].to_numpy(np.float64)
    d = q * pdf["l_discount"].to_numpy(np.float64)
    y = np.where(d < 0.05 * q, 1.0, 0.0)
    n = float(len(q))

    def qsum(v, scale):
        return float(np.floor(v * scale).astype(np.int64).sum()) / scale

    sq, sd = qsum(q, 1e4), qsum(d, 1e4)
    sq2, sd2 = qsum(q * q, 1e1), qsum(d * d, 1e3)
    mq, md = sq / n, sd / n
    vq = np.sqrt(sq2 / n - (sq / n) * (sq / n))
    vd = np.sqrt(sd2 / n - (sd / n) * (sd / n))
    x1, x2 = (q - mq) / vq, (d - md) / vd
    w0 = w1 = w2 = 0.0
    for _ in range(8):
        z = w0 + x1 * w1 + x2 * w2
        e = (0.5 + 0.5 * (z / (1.0 + np.abs(z)))) - y
        s0, s1, s2 = qsum(e, 1e9), qsum(e * x1, 1e9), qsum(e * x2, 1e9)
        w0, w1, w2 = w0 - 4.0 * (s0 / n), w1 - 4.0 * (s1 / n), w2 - 4.0 * (s2 / n)
    z = w0 + x1 * w1 + x2 * w2
    n_correct = int(((z > 0.0) == (y > 0.5)).sum())

    assert (row["w0"], row["w1"], row["w2"]) == (w0, w1, w2)
    assert row["accuracy"] == n_correct / n
    assert row["n_rows"] == int(n)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=300),
    parts=st.integers(min_value=1, max_value=4),
)
@SETTINGS
def test_misra_gries_contract_hypothesis(spark, vals, parts):
    """MG contract on ARBITRARY streams and partitionings (hypothesis):
    size <= k, est <= true, true - est <= N/(k+1) for every key, heavy
    keys always present.  k=4 forces truncation on almost every draw."""
    from bakery_big_data_spark.operators.sketches import misra_gries_summary

    k = 4
    if not vals:
        return
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "g string"
    ).repartition(parts)
    summary = {
        r["g"]: r["cnt"] for r in misra_gries_summary(df, "g", k).collect()
    }
    exact: dict = {}
    for v in vals:
        exact[str(v)] = exact.get(str(v), 0) + 1
    n = len(vals)
    assert len(summary) <= k
    for g, est in summary.items():
        assert est <= exact[g]
    for g, true in exact.items():
        est = summary.get(g, 0)
        assert (true - est) * (k + 1) <= n
        if true * (k + 1) > n:
            assert g in summary


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0,
        max_size=4096,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=200, deadline=None)
def test_wav_codec_roundtrip_property(samples, rate):
    """decode_audio_real(wav_encode_pcm16(x)) == x for EVERY int16 sample
    stream, including empty, full-range extremes, and odd lengths — the
    container parse is lossless, so the audio RMS oracle's codepoint
    restatement is exact for any payload the fixture can produce."""
    from bakery_big_data_spark.operators.multimodal import (
        decode_audio_real,
        wav_encode_pcm16,
    )

    payload = wav_encode_pcm16(samples, sample_rate=rate)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert decode_audio_real(payload).tolist() == samples
