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
from pyspark.storagelevel import StorageLevel


def cut_lineage(
    df: DataFrame,
    checkpoint_dir: str | None,
    storage_level: StorageLevel | None = None,
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — locally (default) or
    to a reliable checkpoint dir when ``checkpoint_dir`` is set.

    ``storage_level`` applies to the local mode only: iterative operators'
    per-round frames are small and keep the deserialized on-heap default,
    but CORPUS-SIZED materializations (the triangle row's ~|E| edge
    frames) must pass a spill-friendly level — the r10 ×100 stress sweep
    (sf10-equivalent, 60 M lineitem → ~66 M co-purchase edges) killed the
    whole JVM with a heap OOM when two edge-sized deserialized block sets
    plus shuffle execution memory landed in the default 8 GiB driver at
    once.  ``MEMORY_AND_DISK_SER`` stores compact serialized blocks that
    evict to disk under pressure; on a real cluster this is the standard
    local-SSD materialization for anything proportional to the corpus."""
    if checkpoint_dir is None:
        if storage_level is None:
            return df.localCheckpoint(eager=True)
        return df.localCheckpoint(eager=True, storageLevel=storage_level)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
