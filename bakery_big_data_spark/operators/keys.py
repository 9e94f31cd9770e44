"""Scalable dense surrogate-key assignment (SURVEY.md §2.5 W1).

The reference assigns surrogate keys with a *global* ``row_number()`` over an
unpartitioned window (``silver_to_gold.py:157-159,229-231,270-273``), which
funnels every row through one partition — fine for a 5-row store dim, fatal
at 100 TB.  :func:`add_surrogate_key` produces the **same dense sequential
keys** with a range-partitioned plan:

1. ``repartitionByRange`` on the ordering columns — partition *i* holds a
   contiguous key range strictly below partition *i+1*'s;
2. per-partition row counts (a tiny aggregate, one row per partition);
3. cumulative offsets over that tiny frame (single-partition window over
   O(num_partitions) rows — trivially cheap);
4. broadcast the offsets back and add a *partition-local* ``row_number``.

Every heavy step is fully parallel; the only serial work is the
O(partitions)-row offset scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_sk_pid"
_RN = "_sk_rn"
_CNT = "_sk_cnt"
_OFF = "_sk_off"


def add_surrogate_key(
    df: DataFrame,
    order_by: list[str | Column],
    key_col: str = "surrogate_key",
    base: int | Column = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense keys ``base+1 .. base+N`` in ``order_by`` order.

    ``order_by`` must be a total order (include a unique tiebreak column) —
    rows that compare equal may land in either of two adjacent range
    partitions, which would make key assignment nondeterministic.

    ``base`` may be a Column already present on ``df`` (e.g. a lazily
    computed MAX(key) broadcast onto every row) — the plan then stays fully
    lazy with no driver scalar read.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    base_col = base if isinstance(base, Column) else F.lit(base)
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    # Cumulative offset of rows in all partitions before this one; the frame
    # is one row per partition, so the unpartitioned window is O(partitions).
    offsets = counts.withColumn(
        _OFF,
        F.coalesce(
            F.sum(_CNT).over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PID, _OFF)
    local = ranged.withColumn(
        _RN, F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(key_col, (base_col + F.col(_OFF) + F.col(_RN)).cast("bigint"))
        .drop(_PID, _RN, _OFF)
    )
