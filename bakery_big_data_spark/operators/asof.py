"""As-of join — match each left row to the latest right row at or before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive non-equi join
(``l.ts >= r.ts`` + keep-latest) plans as a nested loop and explodes on
interval width.  The scalable pattern used here is **union + partitioned
running last**:

1. tag right rows 0, left rows 1; union on (key, ts, tag, payload struct);
2. one window per key ordered by (ts, tag): ``last(payload_struct,
   ignorenulls)`` over unbounded-preceding..current carries the most recent
   right row forward to every left row (tag order makes a right row at the
   exact same timestamp visible to the left row).  The payload travels as
   ONE struct column, so a matched right row whose individual payload values
   are legitimately NULL still wins the carry — the NULL fields stay bound
   to the matched row instead of leaking an older row's values;
3. keep tag-1 rows and unpack the struct.

One shuffle on the key, linear scan per partition — the same cost as a
windowed aggregation, independent of how far back the match lies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


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
    deterministic winner or matches are ambiguous.  ``payload_cols`` must be
    disjoint from ``left``'s columns (the unpacked payload would otherwise
    silently shadow or duplicate left columns).
    """
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"payload_cols collide with left columns: {sorted(overlap)}"
        )
    payload_type = StructType([right.schema[c] for c in payload_cols])
    left_carry = [c for c in left.columns if c != key]

    l_side = left.select(
        key,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *left_carry,
    )
    r_side = right.select(
        key,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*payload_cols).alias("_payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_carry
        ],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("_tag") == 1).select(
        key,
        *left_carry,
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )
