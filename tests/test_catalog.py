"""Every registered query runs and (where an oracle exists) matches DuckDB.

This replicates the driver's t2 gate locally at sf0.001 so regressions are
caught before the per-round verify.
"""

from __future__ import annotations

import pytest

from bakery_big_data_spark.plans import DRIVER_WINDOW, REGISTRY
from tests.oracle import compare, duck_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke, mirroring the driver
    else:
        compare(df, con, q.oracle)


def test_no_oracle_column_types_hugeint(con):
    """DuckDB types SUM(integer) — windowed or not — as HUGEINT (int128),
    which the driver's value hash serializes differently from Spark's BIGINT
    even when every value is identical (the only red rows in r04).  Bind every
    registered oracle (no execution) and assert no output column is int128."""
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        # every oracle reads the pre-registered table views only (the
        # last scratch-file oracle was removed in r07, when
        # csv_ddl_roundtrip's oracle moved to the source customer table)
        rel = con.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            assert str(typ) not in ("HUGEINT", "UHUGEINT"), (
                f"{name}.{col} types {typ}: wrap the aggregate in "
                f"CAST(... AS BIGINT) so the driver hash matches Spark"
            )


def test_no_oracle_complex_top_level_columns(con):
    """The driver's canonicalizer pandas-sorts every output column before
    hashing; `sort_values` factorizes cell values, and Python lists/dicts are
    unhashable — the ONE red driver row of r11 (`collect_sorted_lists`) was
    exactly this, with values verified exact.  Bind every registered oracle
    (no execution) and assert no top-level column is a LIST/ARRAY/MAP/STRUCT:
    serialize complex aggregates with array_to_string/to_json in BOTH the
    query and the oracle, and keep the complex-typed form under pytest."""
    # DuckDB JSON is excluded: it materializes as a plain (hashable) str
    # in pandas, so the canonicalizer handles it fine.
    banned = ("[]", "LIST", "MAP(", "STRUCT(", "UNION(")
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            assert not any(b in t for b in banned), (
                f"{name}.{col} types {typ}: the driver canonicalizer cannot "
                f"hash complex cells — serialize (array_to_string / to_json) "
                f"in both query and oracle"
            )


def test_collect_sorted_lists_array_variant_parity(spark, sf_dir):
    """The unregistered ARRAY-typed list aggregation must serialize to the
    registered driver row exactly (same groups, same element order)."""
    from pyspark.sql import functions as F

    from bakery_big_data_spark.plans.setops_sql import (
        collect_sorted_lists_array,
    )

    arr = collect_sorted_lists_array(spark, sf_dir).select(
        "o_custkey",
        F.array_join(F.col("order_keys").cast("array<string>"), ",").alias(
            "order_keys_csv"
        ),
    )
    reg = REGISTRY["collect_sorted_lists"].build(spark, sf_dir).select(
        "o_custkey", "order_keys_csv"
    )
    a = sorted(map(tuple, arr.collect()))
    b = sorted(map(tuple, reg.collect()))
    assert a == b and len(a) > 0


def test_seeded_rand_is_reproducible(spark, sf_dir):
    q = REGISTRY["seeded_synthetic_features"]
    a = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    assert a == b  # same seed → identical synthetic rows, run to run


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_driver_window_composition():
    """The first 50 registrations are the driver-checked window: they must be
    exactly DRIVER_WINDOW, in order, and every one must carry a DuckDB oracle
    (a hash-checkable row, not a weaker rows-only record)."""
    names = list(REGISTRY)
    assert names[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    missing_oracle = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not missing_oracle, f"window queries without an oracle: {missing_oracle}"


def test_driver_window_follows_rotation_policy():
    """r11 verdict task 5: the committed window literal must equal the
    standing policy's output for the pinned ROTATION_AS_OF horizon —
    anchors first, then never-certified newborns, then
    oldest-certification-first.  Artifacts from rounds AFTER the pin
    (e.g. this round's own CORRECTNESS file landing at round close) do
    not participate, so the assertion is stable within a round; the
    next round bumps ROTATION_AS_OF and regenerates."""
    from bakery_big_data_spark.plans.rotation import (
        ANCHOR_ROWS,
        ROTATION_AS_OF,
        certification_ledger,
        compute_rotation,
    )

    assert ROTATION_AS_OF == 13
    assert DRIVER_WINDOW == compute_rotation(list(REGISTRY))
    # anchors always resident, and every anchor actually registered
    assert DRIVER_WINDOW[: len(ANCHOR_ROWS)] == ANCHOR_ROWS
    # every never-certified registration is in the window (the
    # register-and-certify-same-round discipline cannot regress)
    ledger = certification_ledger()
    newborn = [n for n in REGISTRY if n not in ledger]
    missing = [n for n in newborn if n not in set(DRIVER_WINDOW)]
    assert not missing, f"never-certified rows outside the window: {missing}"
