"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's streaming layer is stateless ingest (SURVEY.md §2.9 "not
present: mapGroupsWithState"); a training-data pipeline needs running
per-entity state (dedup ledgers, rate counters, session trackers).  This
module implements a checkpointed per-user running aggregate: state (event
count + value sum) lives in the state store, survives restarts, and each
micro-batch emits the updated totals for the users it touched.

Scale: state is partitioned by the grouping key across executors (RocksDB/
HDFS-backed state store in production); per-batch work is proportional to
the touched keys, not the accumulated state.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_DDL = "n LONG, v DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained in streaming state.

    Emits one row per touched user per micro-batch with the post-update
    totals — the streaming counterpart of an incrementally-maintained
    aggregate table.
    """

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
