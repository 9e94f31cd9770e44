"""Custom Python DataSource: deterministic synthetic event generator.

The reference's only true external source is Kafka (stream_to_bronze.py:48);
its data *generators* (``generate_sales_events.py`` etc.) are driver-side
Python loops that push to Kafka.  This rebuilds that generation surface as
a first-class Spark 4 Python DataSource
(``spark.read.format("synthetic_events")``) — the generator runs INSIDE the
executors, partitioned, instead of a single driver loop:

- rows are a pure function of (event_id) via the same LCG/mix arithmetic the
  curation family uses, so any partitioning, retry, or cluster size yields
  byte-identical data (generator re-runs are reproducible test fixtures);
- ``partitions()`` splits the id range evenly — generation parallelism
  scales with the cluster exactly like a parquet scan's input splits;
- options: ``n_rows`` (total), ``n_partitions``, ``start_ts`` (epoch µs).

At 100 TB the same shape generates arbitrarily large synthetic corpora with
no driver bottleneck and no shuffle.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_M = 2147483647  # 2^31 - 1
_A = 1103515245
_C = 12345

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _u(event_id: int, salt: int) -> float:
    """Key-derived uniform in [0, 1) — same construction as plans/curation."""
    return ((event_id * _A + _C + salt * 7919) % _M) / float(_M)


def _mix(event_id: int, salt: int) -> int:
    """The integer LCG mix behind :func:`_u` — field derivation stays in
    PURE INTEGER arithmetic (``mix * range // M``), because the float path
    ``int(u * range)`` can land one off at truncation boundaries and then
    no SQL engine can restate the generator exactly."""
    return (event_id * _A + _C + salt * 7919) % _M


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.start_ts = int(options.get("start_ts", 1704067200000000))  # 2024-01-01

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _Range(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition):
        for eid in range(partition.start, partition.end):
            yield _event_row(eid, self.start_ts)


def _event_row(eid: int, start_ts: int):
    from datetime import datetime, timezone

    ts_us = start_ts + eid * 157_000_000  # ~2.6 min cadence
    return (
        eid,
        datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc).replace(
            tzinfo=None
        ),
        (_mix(eid, 1) * 150) // _M,
        _EVENT_TYPES[(_mix(eid, 2) * len(_EVENT_TYPES)) // _M],
        # 2-decimal value via integer floor-quantization: Python round()
        # is banker's rounding and float truncation is boundary-fragile —
        # integer mix*10000//M then one IEEE division is exact everywhere
        (_mix(eid, 3) * 10000) // _M / 100.0,
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """S1 as a CUSTOM STREAMING SOURCE (Spark 4 Python stream reader):
    offsets are plain ``{"next": <event_id>}`` dicts, each micro-batch
    emits the next ``rows_per_batch`` ids up to ``n_rows``, and
    ``readBetweenOffsets`` regenerates any committed range bit-identically
    (rows are a pure function of event_id) — so checkpoint recovery
    replays EXACTLY the rows the lost batch contained, the property Kafka
    needs retained logs for."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 200))
        self.start_ts = int(options.get("start_ts", 1704067200000000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        s = int(start["next"])
        e = min(s + self.rows_per_batch, self.n_rows)
        return (
            iter([_event_row(i, self.start_ts) for i in range(s, e)]),
            {"next": e},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [
                _event_row(i, self.start_ts)
                for i in range(int(start["next"]), int(end["next"]))
            ]
        )


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
