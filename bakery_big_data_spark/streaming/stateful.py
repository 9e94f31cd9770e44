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


SESSION_OUTPUT_DDL = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events LONG, total_value DOUBLE"
)
#: (session_start_us, session_end_us, n_events, value_sum)
SESSION_STATE_DDL = "start_us LONG, end_us LONG, n LONG, v DOUBLE"

_US = 1_000_000


def idle_session_flush(
    events: DataFrame,
    watermark_delay: str = "10 minutes",
    gap_minutes: int = 30,
) -> DataFrame:
    """Hand-rolled stateful sessionizer with EVENT-TIME TIMEOUTS: a user's
    open session lives in the state store and is emitted exactly when the
    watermark passes its end + gap — the "abandoned session flush" that
    ``session_window`` does internally, expressed with the raw
    ``applyInPandasWithState`` primitives (register a timeout, flush on
    ``state.hasTimedOut``, remove state).

    Assumes per-user event-time order across micro-batches (true for
    chronological replay and for any source partitioned by user).  A new
    batch whose first event starts more than ``gap`` after the open
    session's end closes it inline (emitted immediately) and opens a new
    one — so multi-session users are handled without waiting for a
    timeout.  State per user is four scalars; per-batch work is
    proportional to touched keys, and idle keys are reclaimed by their
    timeout instead of leaking."""
    gap_us = gap_minutes * 60 * _US

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(start_us: int, end_us: int, n: int, v: float):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [v],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n, v = state.get
            state.remove()
            yield emit(start_us, end_us, n, v)
            return

        if state.exists:
            start_us, end_us, n, v = state.get
        else:
            start_us = end_us = -1
            n, v = 0, 0.0
        # Concatenate the whole micro-batch for this key before sorting:
        # Arrow hands the group over in ~10k-row chunks, and sorting each
        # chunk independently would see events out of event-time order
        # whenever a group spans chunks.
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for ts, val in zip(batch["ts"], batch["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if start_us < 0:
                start_us, end_us, n, v = ts_us, ts_us, 1, float(val)
            elif ts_us - end_us <= gap_us:
                end_us, n, v = ts_us, n + 1, v + float(val)
            else:
                yield emit(start_us, end_us, n, v)
                start_us, end_us, n, v = ts_us, ts_us, 1, float(val)
        # The file source may coalesce several replay files into one
        # micro-batch, so the batch's own max event time — hence next
        # batch's watermark — can already be past this session's flush
        # time.  Registering a timeout at or before the watermark throws
        # INVALID_TIMEOUT_TIMESTAMP and kills the query; instead emit the
        # definitively-closed session inline (any event that could still
        # extend it is behind the watermark and would be dropped anyway),
        # and clamp surviving timeouts to watermark + 1.
        flush_ms = (end_us + gap_us) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        if flush_ms <= wm_ms:
            if state.exists:
                state.remove()
            yield emit(start_us, end_us, n, v)
        else:
            state.update((start_us, end_us, n, v))
            state.setTimeoutTimestamp(max(flush_ms, wm_ms + 1))

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---- Spark 4 transformWithStateInPandas (arbitrary composite state) --------

TWS_OUTPUT_DDL = (
    "user_id LONG, n_events LONG, total_cents LONG, n_types LONG"
)


def running_user_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user running profile via the Spark 4
    ``transformWithStateInPandas`` ARBITRARY-STATE API — the successor to
    ``applyInPandasWithState`` this module's other operators use, and the
    surface worth certifying separately because its state model is
    different in kind: named TYPED state variables per key (here a
    ``ValueState`` for the running totals and a ``MapState`` holding the
    distinct event-type set) managed individually against the state
    store, instead of one monolithic state tuple; TTL per variable and
    timers come with the same handle.

    Emits one row per touched user per micro-batch with post-update
    (n_events, total_cents, n_types).  Value mass is accumulated as
    int64 CENTS (``floor(value*100)`` — bit-identical in any engine from
    the same double), so the running sum is order-independent and the
    final emission is exactly comparable to a batch aggregate no matter
    how deliveries were micro-batched.

    Scale: same contract as the rest of this module — state is keyed and
    store-backed (transformWithState REQUIRES the RocksDB provider; the
    caller sets ``spark.sql.streaming.stateStore.providerClass``),
    per-batch work proportional to touched keys; the MapState set is
    bounded by the event-type vocabulary per key.

    ENVIRONMENT GATE: executing this operator needs the ``protobuf``
    package (the transformWithState Python state-server protocol is
    protobuf-based; absent in this sandbox, so no pip), which is why it
    carries no registered catalog row — the stateful certification rows
    run on ``applyInPandasWithState`` above.  PLAN CONSTRUCTION is
    dependency-free and covered by tests/test_stateful_streaming.py;
    the end-to-end drain test auto-skips when protobuf is missing and
    certifies batch parity (int64-cents totals, distinct-type counts)
    when it is available.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n LONG, cents LONG"
            )
            self._seen = handle.getMapState("seen", "t STRING", "one INT")

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            if self._totals.exists():
                n, cents = self._totals.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"].to_numpy(np.float64) * 100.0)
                    .astype(np.int64)
                    .sum()
                )
                for tpe in pdf["event_type"].unique():
                    k = (str(tpe),)
                    if not self._seen.containsKey(k):
                        self._seen.updateValue(k, (1,))
            self._totals.update((n, cents))
            n_types = sum(1 for _ in self._seen.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Profile(),
        outputStructType=TWS_OUTPUT_DDL,
        outputMode="Update",
        timeMode="None",
    )
