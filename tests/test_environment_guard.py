"""Early-warning guard for driver-environment shifts.

The driver regenerates ``/root/testdata`` between rounds and has already
shipped two different parquet timestamp annotations (NANOS in rounds 1-2,
NTZ-MICROS in round 3+ — each silently breaking queries that read tables
directly).  These tests fail loudly at the loader if the annotation shifts
again, and prove every scratch materialization's staleness check actually
fires — one red test instead of N red driver rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from bakery_big_data_spark.sources.tables import TPCH_TABLES, load_table


@pytest.mark.parametrize("name", TPCH_TABLES)
def test_every_table_loads_with_ltz_timestamps(spark, sf_dir, name):
    """load_table must normalize whatever annotation the driver shipped to
    TIMESTAMP (LTZ): any NTZ field leaking through breaks unix_micros /
    to_json in downstream plans (the r03 failure mode)."""
    df = load_table(spark, sf_dir, name)
    for f in df.schema.fields:
        assert not isinstance(f.dataType, TimestampNTZType), (
            f"{name}.{f.name} loaded as TIMESTAMP_NTZ — the testdata "
            f"annotation shifted again; extend load_table's normalization"
        )
    assert df.count() > 0


def test_events_ts_is_ltz_timestamp(spark, sf_dir):
    ts = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert ts == "timestamp", ts  # LTZ, not timestamp_ntz / bigint-nanos


def test_partitioned_scratch_staleness_fires(spark, sf_dir):
    """Backdating the materialization marker must trigger a rebuild — the
    exact situation after the driver regenerates the source parquet."""
    from bakery_big_data_spark.plans.io_paths import partitioned_events_path

    p1 = partitioned_events_path(spark, sf_dir)
    marker = os.path.join(p1, "_SUCCESS")
    os.utime(marker, (0, 0))
    partitioned_events_path(spark, sf_dir)
    assert os.path.getmtime(marker) > 0, "stale partitioned scratch not rebuilt"


def test_streaming_replay_staleness_fires(sf_dir, tmp_path):
    from bakery_big_data_spark.plans.streaming_q import _needs_rebuild

    src = tmp_path / "events.jsonl"
    src.write_text("{}\n")
    assert not _needs_rebuild(str(src), sf_dir)  # fresher than testdata
    os.utime(src, (0, 0))
    assert _needs_rebuild(str(src), sf_dir)  # older than testdata → rebuild
    assert _needs_rebuild(str(tmp_path / "missing.jsonl"), sf_dir)


def test_snapshot_scratch_staleness_fires(spark, sf_dir):
    from bakery_big_data_spark.plans.io_paths import _snapshot_table_path

    p1 = _snapshot_table_path(spark, sf_dir)
    marker = os.path.join(p1, "_snapshot_manifest.json")
    os.utime(marker, (0, 0))
    _snapshot_table_path(spark, sf_dir)
    assert os.path.getmtime(marker) > 0, "stale snapshot scratch not rebuilt"
