"""Job orchestration semantics: bounded retries and streaming health-check
with restart.

The reference schedules its Spark jobs through Airflow with per-task
``retries`` / ``retry_delay`` (``orchestration/dags/bakery_batch_etl.py``)
and keeps the streaming queries alive with an hourly health-check DAG that
restarts any dead query (``bakery_streaming_manager.py:27-34,115-145``).
Those semantics belong to the job layer, not to a scheduler binary, so they
are re-expressed here as two small engine-side primitives that ``jobs.py``
(or any external scheduler) can wrap around a unit of work:

- :func:`run_with_retries` — the Airflow task contract: run a callable up
  to ``1 + max_retries`` times with (optionally backed-off) delays, re-raise
  the last failure, and report each attempt to an optional hook (the log /
  alerting seam).
- :class:`StreamSupervisor` — the streaming-manager contract: each query is
  registered as a *factory* (restarting a dead query needs a fresh
  ``start()``; a StreamingQuery object is single-use), and every
  :meth:`StreamSupervisor.check` pass restarts what died, up to a restart
  budget per query — the hourly health-check loop distilled to its
  observable behavior, minus the scheduler clock (callers decide cadence).

Scale note: both primitives are driver-side control flow around plans, not
data paths — they add zero work per row and are byte-identical on a laptop
and a 1000-executor cluster.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery


def run_with_retries(
    fn: Callable[[], object],
    max_retries: int = 2,
    delay_s: float = 0.0,
    backoff: float = 2.0,
    on_attempt: Callable[[int, Exception | None], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Run ``fn`` with the reference's Airflow-task retry contract.

    Attempts ``fn`` up to ``1 + max_retries`` times; sleeps ``delay_s``
    (multiplied by ``backoff`` after each failure) between attempts; calls
    ``on_attempt(attempt_index, exception_or_None)`` after every try; returns
    the first successful result or re-raises the final exception.
    """
    attempt = 0
    wait = delay_s
    while True:
        try:
            result = fn()
        except Exception as exc:
            if on_attempt is not None:
                on_attempt(attempt, exc)
            if attempt >= max_retries:
                raise
            attempt += 1
            if wait > 0:
                sleep(wait)
            wait *= backoff
        else:
            if on_attempt is not None:
                on_attempt(attempt, None)
            return result


@dataclass
class _Supervised:
    name: str
    factory: Callable[[], StreamingQuery]
    query: StreamingQuery
    restarts: int = 0


@dataclass
class StreamSupervisor:
    """Health-check-and-restart supervision for streaming queries.

    The reference's ``bakery_streaming_manager`` DAG polls hourly: any query
    that is no longer running is resubmitted (``:27-34,115-145``).  Here the
    poll is :meth:`check` (cadence is the caller's — a scheduler, a loop, a
    test); each registered *factory* must start and return a fresh
    ``StreamingQuery``.  A query that has died more than
    ``max_restarts_per_query`` times stays down and is reported, so a
    crash-looping job cannot hot-spin the driver.
    """

    max_restarts_per_query: int = 3
    on_event: Callable[[str, str], None] | None = None  # (query_name, event)
    _entries: list[_Supervised] = field(default_factory=list)

    def register(self, name: str, factory: Callable[[], StreamingQuery]) -> StreamingQuery:
        """Start a query via its factory and track it for restarts."""
        q = factory()
        self._entries.append(_Supervised(name=name, factory=factory, query=q))
        self._emit(name, "started")
        return q

    def check(self) -> dict[str, str]:
        """One health-check pass: restart every dead query within budget.

        Returns ``{query_name: status}`` with status one of ``running``,
        ``restarted``, ``gave_up``.
        """
        statuses: dict[str, str] = {}
        for entry in self._entries:
            if entry.query.isActive:
                statuses[entry.name] = "running"
                continue
            if entry.restarts >= self.max_restarts_per_query:
                statuses[entry.name] = "gave_up"
                self._emit(entry.name, "gave_up")
                continue
            entry.restarts += 1
            entry.query = entry.factory()
            statuses[entry.name] = "restarted"
            self._emit(entry.name, "restarted")
        return statuses

    def stop_all(self) -> None:
        """Best-effort stop of every supervised query (shutdown path)."""
        for entry in self._entries:
            try:
                entry.query.stop()
            except Exception:
                pass
            self._emit(entry.name, "stopped")

    def _emit(self, name: str, event: str) -> None:
        if self.on_event is not None:
            self.on_event(name, event)
