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
    keyed: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one (row, bucket, cnt) cell per populated counter.

    One aggregation; partial (map-side) combine does the heavy lifting, so
    the shuffle carries at most ``depth*width`` rows per mapper no matter
    how many distinct keys the stream holds.  Cell-wise addition of two
    builds equals the build of the concatenated streams (mergeable).

    ``weight_col``: build from a PRE-AGGREGATED (key, weight) frame —
    each cell sums the weights instead of counting rows.  Bit-identical
    to the unweighted build over the raw stream (a cell's counter is the
    integer sum of its keys' frequencies either way), but the explode
    runs over |distinct keys| rows instead of |stream| rows, so a query
    that already pays the per-key rollup (for exact counts riding along)
    never re-scans the raw stream just to sketch it (guide §1.2:
    don't compute the same pass twice).  The hash is projected once per
    key row before the explode (the Bloom-row lesson: inlining md5 into
    the Generate repeats it per hash row and bloats codegen).
    """
    cols = [portable_key_hash(F.col(key_col)).alias("_h")] + (
        [F.col(weight_col).alias("_w")] if weight_col else []
    )
    hashed = keyed.select(*cols)
    cells = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col("_h"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
        *([F.col("_w")] if weight_col else []),
    )
    agg = (
        F.sum("_w").cast("bigint") if weight_col else F.count(F.lit(1))
    ).alias("cnt")
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(agg)


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


#: Carter-Wegman parameters for the Bloom filter's 6 bit-position hashes
#: (literals so the static oracle SQL can carry them).
BLOOM_A = [1, 1566083941, 998244353, 1103515245, 1140671485, 65793]
BLOOM_B = [0, 97531, 12345, 424243, 390451, 28411]

#: 63 bits per word — the sign bit of the BIGINT word is never used, so
#: ``1 << bit`` stays positive in every engine (no two's-complement edge).
_WORD_BITS = 63


def _bloom_positions(h: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of the key's ``num_hashes`` bit positions, from an ALREADY
    PROJECTED base-hash column.

    The hash must be a real column (projected once per row), not the
    md5 expression inline: inlining it re-evaluates md5 per hash row and
    — worse — blows the expression tree up ~12x (measured on the Bloom
    row: the Generate node carried 12 md5 subtrees plus 12 copies of a
    63-literal mask array, and plan/codegen time dominated the query).
    """
    return F.array(
        *[
            ((F.lit(BLOOM_A[i]) * h + F.lit(BLOOM_B[i])) % _P) % num_bits
            for i in range(num_hashes)
        ]
    )


def _bloom_word_mask(pos: Column) -> tuple[Column, Column]:
    """(word, mask) for a bit position: word = floor(pos / 63) (the
    division is exact in double for pos < 2^31) and mask = 1 << (pos % 63)
    via shiftleft on BIGINT — exact for shifts 0..62, identical to the
    former 63-entry literal power-of-two table but without repeating the
    63 literals per hash row in the plan.  ``call_function`` because the
    ``F.shiftleft`` wrapper only accepts a literal shift."""
    word = F.floor(pos / F.lit(_WORD_BITS)).cast("bigint")
    mask = F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        (pos % _WORD_BITS).cast("int"),
    )
    return word, mask


def bloom_build(
    keyed: DataFrame,
    key_col: str,
    num_bits: int = 32256,
    num_hashes: int = 6,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as (word, bits) BIGINT rows —
    the 100 TB semi-join-reduction sketch (runtime row-level filtering:
    ship a ~4 KB filter to the fact scan instead of shuffling the fact
    table into a join just to discard most of it).

    ONE ``bit_or`` aggregation: map-side partial combine means the
    shuffle carries at most ``num_bits/63`` word rows per mapper no
    matter the key count, duplicates are free (OR is idempotent — no
    DISTINCT pass needed), and two builds merge by word-wise OR (the
    same mergeability as the CMS/HLL rows).  Engine-portable by
    construction: md5-half base hash + Carter-Wegman bit positions in
    exact BIGINT arithmetic, 63-bit words so the sign bit never flips —
    every word is bit-identical cross-engine.

    Plan shape note (guide §4.2/§7.2 spirit): the base hash is projected
    ONCE per row and the explode carries plain bit positions; word/mask
    derive from the exploded position.  The naive inline form evaluated
    md5 once per (hash row, struct field) — 12x — and shipped a 63-literal
    array per copy through the plan, which made planning/codegen, not the
    data, the cost of a small build.
    """
    hashed = keyed.select(
        portable_key_hash(F.col(key_col).cast("string")).alias("_h")
    )
    pos = hashed.select(
        F.explode(
            _bloom_positions(F.col("_h"), num_bits, num_hashes)
        ).alias("pos")
    )
    word, mask = _bloom_word_mask(F.col("pos"))
    cells = pos.select(word.alias("word"), mask.alias("mask"))
    return cells.groupBy("word").agg(F.bit_or(F.col("mask")).alias("bits"))


def bloom_probe(
    keys: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 32256,
    num_hashes: int = 6,
    out_col: str = "in_bloom",
) -> DataFrame:
    """Membership probe: a key is (possibly) present iff ALL its
    ``num_hashes`` bits are set.  The filter (<= num_bits/63 rows) is
    broadcast, so the probe is a map-side join — zero shuffle of the
    probe side, the property that makes Bloom pruning worth it at scale.
    No false negatives ever; false positives at the designed rate."""
    hashed = keys.select(
        key_col,
        portable_key_hash(F.col(key_col).cast("string")).alias("_h"),
    )
    word, mask = _bloom_word_mask(F.col("pos"))
    probes = hashed.select(
        key_col,
        F.explode(
            _bloom_positions(F.col("_h"), num_bits, num_hashes)
        ).alias("pos"),
    ).select(key_col, word.alias("word"), mask.alias("mask"))
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .groupBy(key_col)
        .agg(
            F.bool_and(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).alias(out_col)
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch with set operations
# ---------------------------------------------------------------------------

#: 60-bit hash space: md5 first 15 hex digits.  2^60 is exactly
#: representable as a double, so the estimator constant is portable.
KMV_SPACE = float(1 << 60)


def kmv_hash60(key: Column) -> Column:
    """60-bit engine-portable hash — md5 first 15 hex digits, restatable
    as ``('0x' || substr(md5(k), 1, 15))::BIGINT`` in DuckDB."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")


def kmv_side_sketches(
    keyed: DataFrame,
    side_col: str,
    key_col: str,
    k: int = 64,
    salt_buckets: int = 32,
) -> DataFrame:
    """Bottom-k distinct sketch per ``side_col`` group: the k smallest
    60-bit hashes of the distinct keys, as one sorted array per side.

    Why KMV next to HLL (Beyer et al. 2007 / theta sketches): same
    distinct-count job, but the sketch supports SET OPERATIONS — the
    union of two sketches is the bottom-k of the merged arrays, and
    intersections estimate via the inclusion fraction — which HLL
    registers cannot do.  Mergeable across days/partitions like the CMS
    and HLL rows (bottom-k of bottom-ks = bottom-k of the union).

    Scale shape: one distinct hash-agg on (side, h), then TWO window
    passes — rank within (side, h mod salt_buckets) keeps every sort
    partition at ~1/salt_buckets of the side (no single-reducer
    bottleneck; sort-based windows spill gracefully), and the second
    pass ranks only the surviving salt_buckets*k rows per side.  The
    estimator ``(k-1)·M/h_k`` uses one double multiply + divide.
    """
    from pyspark.sql.window import Window

    dh = keyed.select(
        F.col(side_col).alias("side"),
        kmv_hash60(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w1 = Window.partitionBy(
        "side", F.pmod(F.col("h"), F.lit(salt_buckets))
    ).orderBy("h")
    survivors = (
        dh.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy("side").orderBy("h")
    topk = (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return topk.groupBy("side").agg(
        F.array_sort(F.collect_list("h")).alias("arr")
    )


def kmv_estimate(arr: Column, k: int) -> Column:
    """Distinct-count estimate from a bottom-k array: exact when the
    sketch holds the whole set (< k values), else ``(k-1)·M / h_k``."""
    return F.when(
        F.size(arr) < k, F.size(arr).cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(KMV_SPACE))
        / F.element_at(arr, k).cast("double")
    )


# ---- Misra-Gries deterministic heavy hitters -------------------------------


def _mg_compress(acc: dict, k: int) -> dict:
    """Reduce a counter dict to at most ``k`` entries, Misra-Gries style:
    subtract the (k+1)-th largest count from everything and keep the
    strictly positive remainder (at most ``k`` keys survive, since the
    (k+1)-th largest itself hits zero)."""
    if len(acc) <= k:
        return acc
    import heapq

    d = heapq.nlargest(k + 1, acc.values())[-1]
    return {g: c - d for g, c in acc.items() if c > d}


def misra_gries_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """DETERMINISTIC mergeable heavy-hitter summary (Misra & Gries 1982;
    mergeability per Agarwal et al. 2013, "Mergeable summaries", PODS) —
    the counter-based complement to the hash-based Count-Min row: no hash
    functions, no probability; the guarantee is worst-case.

    Contract, for a stream of N keys summarized with parameter ``k``:

    - ``est(x) <= true(x)`` for every key (under-counts only);
    - ``true(x) - est(x) <= N/(k+1)`` for every key, including absent
      keys (``est = 0``) — hence every key with ``true > N/(k+1)`` is
      guaranteed IN the summary;
    - the summary holds at most ``k`` entries.

    Merge-tree safety: each compression (batch-fold inside a partition,
    and the final cross-partition merge) combines counter dicts by
    addition and subtracts the (k+1)-th largest combined value.  Every
    unit subtracted is subtracted from k+1 distinct keys simultaneously,
    so total decrement D satisfies (k+1)·D <= N regardless of the merge
    tree's shape — the N/(k+1) bound survives arbitrary partitioning
    (the multi-way form of Agarwal et al.'s Lemma 1).

    Shape at 100 TB: stage 1 is an Arrow ``mapInPandas`` holding at most
    ``8k`` counters per task (bounded memory — the entire point vs an
    exact GROUP BY over an unbounded key space) and emitting <= k rows
    per partition; stage 2 ships k rows/partition to a key-summed merge
    and one take-ordered over the <= k·P-row partial frame.  No stage
    ever materializes per-key state proportional to key cardinality.
    """

    def partial(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for g, c in pdf["g"].value_counts().items():
                acc[g] = acc.get(g, 0) + int(c)
            if len(acc) > 8 * k:
                acc = _mg_compress(acc, k)
        acc = _mg_compress(acc, k)
        if acc:
            yield pd.DataFrame(
                {"g": list(acc.keys()), "cnt": list(acc.values())}
            )

    parts = df.select(F.col(key_col).alias("g")).mapInPandas(
        partial, "g string, cnt long"
    )
    summed = parts.groupBy("g").agg(F.sum("cnt").alias("cnt"))
    # (k+1)-th largest combined counter (0 when fewer than k+1 survive):
    # a take-ordered over the <= k*P-row partial frame, never the stream.
    drow = (
        summed.orderBy(F.col("cnt").desc())
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) == k + 1, F.min("cnt"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("d")
        )
    )
    return (
        summed.crossJoin(F.broadcast(drow))
        .select("g", (F.col("cnt") - F.col("d")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
