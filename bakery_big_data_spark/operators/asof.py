"""As-of join — match each left row to the latest right row at or before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive non-equi join
(``l.ts >= r.ts`` + keep-latest) plans as a nested loop and explodes on
interval width.  The scalable pattern used here is **union + partitioned
running last**:

1. tag right rows 0, left rows 1; union on (key, ts, tag, payload…);
2. one window per key ordered by (ts, tag): ``last(payload, ignorenulls)``
   over unbounded-preceding..current carries the most recent right payload
   forward to every left row (tag order makes a right row at the exact same
   timestamp visible to the left row);
3. keep tag-1 rows.

One shuffle on the key, linear scan per partition — the same cost as a
windowed aggregation, independent of how far back the match lies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right row
    with ``right_ts <= left_ts`` on the same key (NULLs when none).

    ``right`` must be unique per (key, right_ts) — pre-deduplicate with a
    deterministic winner or matches are ambiguous.
    """
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_tag", F.lit(1)
    )
    for c in payload_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = (
        right.select(
            key, F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"), *payload_cols
        )
    )
    for c in left.columns:
        if c not in (key,):
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.select(
        key, "_ts", "_tag", *payload_cols, *[c for c in left.columns if c != key]
    ).unionByName(
        r_tagged.select(
            key, "_ts", "_tag", *payload_cols, *[c for c in left.columns if c != key]
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        key,
        "_ts",
        "_tag",
        *[c for c in left.columns if c != key],
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).drop("_ts", "_tag")
