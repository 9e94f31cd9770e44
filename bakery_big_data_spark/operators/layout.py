"""Z-order (Morton) clustering for multi-dimensional data skipping.

The 100 TB problem: parquet/ORC scans prune row groups by min/max column
stats, but a table sorted by ONE key only skips well on that key.  When
queries filter on two dimensions (user AND day, region AND product),
interleaving the dimensions' bits into one Morton key and range-sorting
the write by that key gives every file a small bounding BOX in both
dimensions — a predicate on either dimension (or both) prunes most files.
This is Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's z-ordered rewrite,
re-expressed with vanilla ``repartitionByRange`` + ``sortWithinPartitions``
so the sort is a single range shuffle and files stay statistically tight.

All bit math is plain BIGINT shifts/masks — engine-exact (the
``layout_zorder_keys`` catalog query hash-checks it against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Magic masks spreading a 16-bit value's bits to even positions (the
#: classic "Interleave bits by Binary Magic Numbers" construction —
#: public-domain Stanford Bit Twiddling Hacks).
_SPREAD_STEPS: list[tuple[int, int]] = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to the even bit positions of a
    32-bit lane (b15..b0 → positions 30,28,...,0)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton (Z-order) key interleaving the low 16 bits of two
    non-negative dimensions: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1.  Pure BIGINT shifts/masks — identical on any engine."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    dims: tuple[str, str],
    num_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Morton key of two dimensions.

    ``repartitionByRange`` on the key gives each output file a contiguous
    Z-curve segment (a bounded rectangle union in dim space), and the
    within-partition sort keeps row-group stats tight inside each file —
    one range shuffle total, no global sort.  Readers then prune files on
    EITHER dimension's min/max stats (tests/test_io.py measures the
    skipping on both axes)."""
    keyed = df.withColumn("_zkey", morton_key(F.col(dims[0]), F.col(dims[1])))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_col: str = "hkey",
    bits: int = 8,
) -> DataFrame:
    """Append the Hilbert-curve index of ``(x_col & 2^bits-1,
    y_col & 2^bits-1)`` — the locality-preserving sibling of the Morton
    key: CONSECUTIVE Hilbert indices are always edge-adjacent cells (the
    Z-curve jumps across the plane at every power-of-two boundary), so a
    range-partitioned writer gets files whose dim-space footprint is a
    compact blob rather than a rectangle union — tighter min/max stats
    per file on both dimensions, fewer false-positive file reads.

    Classic per-level fold (rx/ry quadrant bits, Gray-coded digit,
    conditional reflect + transpose), unrolled over ``bits`` levels as
    chained projections — every level's state lands in bound columns, so
    CollapseProject cannot inline the (multiply-referenced, non-cheap)
    state expressions into an exponential tree; the same two-stage
    binding discipline as the MinHash band slices.  Integer-only BIGINT
    arithmetic — bit-identical on any engine; the oracle restates the
    identical level chain as CTEs.  Bijectivity and step-adjacency are
    property-tested over the full 2^bits × 2^bits grid.
    """
    mask = (1 << bits) - 1
    out = df.withColumn("_hx", F.col(x_col).bitwiseAND(F.lit(mask))).withColumn(
        "_hy", F.col(y_col).bitwiseAND(F.lit(mask))
    ).withColumn("_hd", F.lit(0).cast("bigint"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        out = out.withColumn(
            "_rx", F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ).withColumn(
            "_ry", F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        )
        out = out.withColumn(
            "_hd",
            F.col("_hd")
            + F.lit(s * s).cast("bigint")
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")).cast(
                "bigint"
            ),
        )
        # reflect (only when ry=0 and rx=1), then transpose (when ry=0)
        out = out.withColumn(
            "_nx",
            F.when(
                (F.col("_ry") == 0) & (F.col("_rx") == 1),
                F.lit(s - 1) - F.col("_hx"),
            ).otherwise(F.col("_hx")),
        ).withColumn(
            "_ny",
            F.when(
                (F.col("_ry") == 0) & (F.col("_rx") == 1),
                F.lit(s - 1) - F.col("_hy"),
            ).otherwise(F.col("_hy")),
        )
        out = out.withColumn(
            "_hx2", F.when(F.col("_ry") == 0, F.col("_ny")).otherwise(F.col("_nx"))
        ).withColumn(
            "_hy2", F.when(F.col("_ry") == 0, F.col("_nx")).otherwise(F.col("_ny"))
        )
        out = (
            out.drop("_hx", "_hy", "_rx", "_ry", "_nx", "_ny")
            .withColumnRenamed("_hx2", "_hx")
            .withColumnRenamed("_hy2", "_hy")
        )
    return out.withColumn(out_col, F.col("_hd")).drop("_hx", "_hy", "_hd")
