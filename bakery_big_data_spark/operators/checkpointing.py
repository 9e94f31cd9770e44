"""Lineage truncation for iterative operators (BPE merges, connected
components).

Both iterative operators consume the previous round's frame more than once,
so the logical plan doubles per round — lineage must be cut every round.
Two modes:

- ``checkpoint_dir=None`` (default): ``localCheckpoint(eager=True)`` —
  blocks live in executor storage, zero filesystem I/O, released by the
  ContextCleaner on GC.  On a multi-executor cluster an executor loss
  invalidates the blocks and the job FAILS (loudly — localCheckpoint
  lineage is truncated, there is nothing to recompute from).
- ``checkpoint_dir="hdfs://..."``: reliable ``checkpoint(eager=True)`` —
  each round's frame is written to fault-tolerant storage, so the merge
  loop survives executor loss at the cost of one vocab-sized write per
  round.  This is the production mode for long merge schedules on real
  clusters.  Reliable checkpoint files are only auto-deleted when
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true``; otherwise
  clean the directory after the run.

Results are bit-identical across modes (asserted by
``tests/test_bpe.py::test_reliable_checkpoint_same_result`` and
``tests/test_dedup.py::test_connected_components_reliable_checkpoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — locally (default) or
    to a reliable checkpoint dir when ``checkpoint_dir`` is set."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
