"""EWMA grouped Arrow fold (operators/timeseries.py)."""

from __future__ import annotations

import pytest

from bakery_big_data_spark.operators.timeseries import ewma


def test_ewma_hand_checked(spark):
    df = spark.createDataFrame(
        [("a", 3, 3.0), ("a", 1, 1.0), ("a", 2, 2.0)],
        "k string, i int, x double",
    )
    got = {
        r["i"]: r["ewma"]
        for r in ewma(df, ["k"], "i", "x", alpha=0.5).collect()
    }
    # s1 = 1; s2 = .5*2 + .5*1 = 1.5; s3 = .5*3 + .5*1.5 = 2.25 — and the
    # fold must sort by the order column, not take arrival order.
    assert got == {1: 1.0, 2: 1.5, 3: 2.25}


def test_ewma_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 0.0), ("a", 2, 10.0), ("b", 2, 4.0)],
        "k string, i int, x double",
    )
    got = {
        (r["k"], r["i"]): r["ewma"]
        for r in ewma(df, ["k"], "i", "x", alpha=0.25).collect()
    }
    assert got[("a", 2)] == pytest.approx(10.0)
    assert got[("b", 2)] == pytest.approx(0.25 * 4.0)
