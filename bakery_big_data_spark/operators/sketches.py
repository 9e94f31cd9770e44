"""Count-Min sketch — the frequency-estimation workhorse beside HLL.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): a ``depth x width`` counter grid;
each key increments one counter per row (row i uses an independent hash),
and a key's frequency estimate is the MIN over its ``depth`` counters.
Guarantees: ``est >= true`` always (counters only over-count), and
``est <= true + (e/width)·N`` with probability ``1 - e^-depth``.

Why it matters at 100 TB: heavy-hitter detection (hot keys, top terms,
abusive senders) without a full ``GROUP BY key`` over an unbounded key
space — the sketch is ``depth*width`` counters regardless of cardinality,
the build is ONE map-side-combinable aggregation whose shuffle carries at
most ``depth*width`` rows per mapper, and sketches from different
partitions/days MERGE by cell-wise addition (the same mergeability that
makes the HLL row incremental).

Engine-portable by construction: the base hash is the repo's 31-bit
md5-half (codegen-native, restatable as ``('0x'||substr(md5(k),1,8))``
in DuckDB), and each row's bucket is a Carter-Wegman multiply-shift over
it in exact BIGINT arithmetic — every counter is bit-identical
cross-engine, so the oracle certifies build AND estimate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2147483647  # 2^31 - 1 (Mersenne prime — the repo's portable modulus)

#: Fixed Carter-Wegman row parameters (depth up to 4) — literals so the
#: static oracle SQL can carry them.
CMS_A = [1, 1566083941, 998244353, 1103515245]
CMS_B = [0, 97531, 12345, 424243]


def portable_key_hash(key: Column) -> Column:
    """31-bit engine-portable base hash (md5 first hex half)."""
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_P))
    )


def _bucket(h: Column, row: int, width: int) -> Column:
    return ((F.lit(CMS_A[row]) * h + F.lit(CMS_B[row])) % _P) % width


def count_min_build(
    keyed: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch: one (row, bucket, cnt) cell per populated counter.

    One aggregation; partial (map-side) combine does the heavy lifting, so
    the shuffle carries at most ``depth*width`` rows per mapper no matter
    how many distinct keys the stream holds.  Cell-wise addition of two
    builds equals the build of the concatenated streams (mergeable).
    """
    h = portable_key_hash(F.col(key_col))
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(h, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for each key: MIN over the key's ``depth``
    counters (broadcast the <= depth*width-cell sketch; the probe is a
    tiny hash join, never a scan)."""
    h = portable_key_hash(F.col(key_col))
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(h, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
