"""Document deduplication operators: shingling, MinHash+LSH, SimHash.

LLM-training-data dedup re-expressed Spark-first (an extension family beyond
the reference's surface — the reference's only dedup is MERGE-by-key,
``bronze_to_silver.py:78-83``).  Everything here is built-in higher-order
functions (``transform``/``aggregate``/``zip_with`` + ``xxhash64``) — JVM
codegen, zero Python UDFs.

100 TB design notes:
- candidate generation is a *band-bucket equi-join* (shuffle keyed on
  ``(band_index, band_hash)``) — never an all-pairs cross join; work scales
  with Σ bucket², which LSH keeps near-linear for realistic corpora;
- pathological buckets (boilerplate shingle sets shared by millions of docs)
  are the classic skew risk: AQE skew-join splits oversized buckets, and
  ``candidate_pairs`` exposes ``max_bucket`` to cap them explicitly;
- signatures are fixed-width arrays of BIGINT — 64 hashes ≈ 512 B/doc, fine
  to shuffle; shingle sets are only re-materialized for the candidate pairs
  during verification (a second equi-join), not carried through banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokenization (non-distinct, order preserved)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a text column.

    Guarded for short documents: fewer than ``n`` words → empty set (an
    unguarded ``sequence(1, len-n+1)`` would run *descending* and index out
    of range).
    """
    ws = words(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(
            "_", *[F.element_at(ws, i + off) for off in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature via one base hash + a multiply-shift family.

    Each shingle is xxhash64'd ONCE (string hashing dominates cost), then
    the *i*-th family member is the Carter-Wegman mix
    ``(a_i * h31 + b_i) mod p`` over the 31-bit truncation — long arithmetic
    only, ~30× cheaper than re-hashing the string per slot, and bounded so
    it can't overflow under ANSI arithmetic.  ``P(sig_a[i] == sig_b[i]) =
    Jaccard(a, b)`` as usual.  Computed in a SINGLE pass over the shingle
    array (fold keeping the running minima).  Empty shingle sets yield the
    sentinel in every slot; exclude them before banding or they all collide.
    """
    import random

    rng = random.Random(13)
    params = [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]
    p = (1 << 61) - 1  # Mersenne prime; a*h31+b < 2^63, no overflow
    mask = (1 << 31) - 1
    return F.aggregate(
        shingles,
        F.array_repeat(F.lit(p).cast("bigint"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            _family(F.xxhash64(s).bitwiseAND(F.lit(mask)), params, p),
            lambda a, b: F.least(a, b),
        ),
    )


def _family(h31: Column, params: list[tuple[int, int]], p: int) -> Column:
    return F.array(
        *[
            (h31 * F.lit(a).cast("bigint") + F.lit(b).cast("bigint")) % p
            for a, b in params
        ]
    )


def lsh_band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Hash each band (``rows_per_band`` consecutive signature slots) to one
    bucket key.  Two docs collide in band *j* iff their slices are identical;
    P(collision in ≥1 band) = 1-(1-J^r)^b — tune (b, r) to the target
    similarity threshold."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(
            F.slice(signature, j * rows_per_band + 1, rows_per_band), j
        ),
    )


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    bands: int = 32,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs ``(id_a < id_b)`` via band-bucket grouping.

    One shuffle: explode band hashes → groupBy bucket → expand in-bucket
    pairs with array combinatorics (signatures are computed exactly once; a
    band self-join would re-evaluate the MinHash expression on both sides).
    ``max_bucket`` drops buckets larger than the cap (boilerplate guard at
    extreme scale — a bucket of k docs contributes k² candidate pairs).
    """
    # Materialize the signature as its own projection so the 32 band slices
    # reference a bound column — inlined, each band hash would re-evaluate
    # the whole MinHash fold (32× redundant work; CollapseProject keeps
    # multiply-referenced expensive expressions un-inlined).
    sigd = df.filter(F.size(shingle_col) > 0).select(
        F.col(id_col),
        # exactly as many hash family members as the bands consume
        minhash_signature(
            F.col(shingle_col), num_hashes=bands * rows_per_band
        ).alias("_sig"),
    )
    banded = sigd.select(
        F.col(id_col),
        F.posexplode(
            lsh_band_hashes(F.col("_sig"), bands, rows_per_band)
        ).alias("band_idx", "band_hash"),
    )
    return _bucket_pair_expand(banded, id_col, max_bucket)


def _bucket_pair_expand(
    banded: DataFrame, id_col: str, max_bucket: int | None = None
) -> DataFrame:
    """(band_idx, band_hash, id) rows → distinct in-bucket candidate pairs
    via one groupBy + array combinatorics (shared by the xxhash64 and
    portable banding paths)."""
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.array_sort(F.collect_list(id_col)).alias("_ids")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    pair_structs = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x: F.transform(
                F.filter(F.col("_ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.filter(F.size("_ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def portable_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    bands: int = 16,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs over the ENGINE-PORTABLE MinHash banding
    (:func:`with_portable_minhash_bands`): same bucket-join shape as
    :func:`candidate_pairs`, but every band key is bit-identical
    cross-engine, so a DuckDB oracle can re-derive the exact candidate
    predicate (banding-aware certification at any scale factor — the r08
    gate-oracle lesson; the xxhash64 family's misses are irreproducible
    outside Spark)."""
    bands_df = with_portable_minhash_bands(
        df.filter(F.size(shingle_col) > 0),
        id_col,
        shingle_col,
        bands=bands,
        rows_per_band=rows_per_band,
    )
    banded = bands_df.select(
        F.col(id_col),
        F.posexplode("band_keys").alias("band_idx", "band_hash"),
    )
    return _bucket_pair_expand(banded, id_col, max_bucket)


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard |A∩B| / (|A|+|B|-|A∩B|) on distinct-element arrays.

    Integer set sizes and a single double division — bit-identical across
    engines given the same sets.
    """
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    return inter.cast("double") / (
        F.size(shingles_a) + F.size(shingles_b) - inter
    )


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs → (id_a, id_b, jaccard).

    Two equi-joins to re-attach shingle sets; LSH false positives are
    filtered here, so the final output is exact (recall is the only
    probabilistic part, bounded by the band parameters).
    """
    sa = docs.select(
        F.col(id_col).alias("id_a"), F.col(shingle_col).alias("_sh_a")
    )
    sb = docs.select(
        F.col(id_col).alias("id_b"), F.col(shingle_col).alias("_sh_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exact_ngram_pairs(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
) -> DataFrame:
    """Exact (100%-recall) near-dup pairs via shared-shingle count join.

    Intersection sizes come from the token equi-join itself — COUNT(*) per
    (id_a, id_b) over shared distinct shingles — so the whole pipeline is
    codegen'd joins + hash aggregates with no per-pair array intrinsics
    (an array_intersect per candidate pair is the slow path: interpreted,
    O(|A|+|B|) per pair).  Never all-pairs; at extreme scale prefer LSH,
    whose candidate volume is bounded by band collisions instead of
    shared-token frequency.
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.col(shingle_col)).alias("_shingle")
    )
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a._shingle") == F.col("b._shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = docs.select(
        F.col(id_col), F.size(F.col(shingle_col)).alias("_n")
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    jac = F.col("_inter").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_inter")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def canonical_assignment(
    docs: DataFrame, id_col: str, pairs: DataFrame
) -> DataFrame:
    """Map every doc to ``canonical_id`` = min(self, direct near-dup
    neighbors) — single-pass star contraction.  Equals connected components
    when duplicate clusters are stars/cliques around their minimum id (the
    common case for near-dup clusters); chains need the pass iterated to a
    fixpoint."""
    nbrs = pairs.select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("_nbr")
    ).unionAll(
        pairs.select(F.col("id_b").alias(id_col), F.col("id_a").alias("_nbr"))
    )
    return (
        docs.select(id_col)
        .join(nbrs, id_col, "left")
        .groupBy(id_col)
        .agg(
            F.least(
                F.col(id_col), F.coalesce(F.min("_nbr"), F.col(id_col))
            ).alias("canonical_id")
        )
    )


def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Duplicate-cluster resolution as true connected components — iterative
    min-label propagation to a fixpoint.

    :func:`canonical_assignment` is the one-pass approximation (exact for
    star/clique clusters); chains (a–b, b–c with no a–c edge) need the
    label to propagate hop by hop.  Each round joins current labels across
    the edge list and takes the min of (self, neighbors') labels; converged
    when no label changes.  Rounds needed = graph diameter — near-dup
    clusters are shallow, so this terminates in 2-3 rounds in practice
    (``max_iter`` bounds adversarial chains).

    Driver involvement is one convergence check (a count) per round — the
    legitimate control-flow use, not a data round-trip; per-round work is
    two shuffles (edge join + min agg).

    Each round's label frontier is materialized with a LINEAGE CUT, not a
    bare ``persist``: the next frontier's logical plan references the
    previous one twice (the neighbor join and the self side), so with
    persist alone — which short-circuits execution but leaves the logical
    tree intact — Catalyst analyzes a 2^rounds-node plan and the driver
    OOMs near diameter 10 (found by the diameter-9 chain in
    ``tests/test_dedup.py::test_connected_components_reliable_checkpoint``;
    the 'raise max_iter' escape hatch below was unusable without this).
    Same failure class as the BPE merge loop, same cure
    (:mod:`bakery_big_data_spark.operators.checkpointing`).

    ``checkpoint_dir``: when set, the per-round cut is a reliable
    ``.checkpoint()`` so a deep-diameter run on a real cluster survives
    executor loss; results are bit-identical across modes.
    """
    from bakery_big_data_spark.operators.checkpointing import cut_lineage
    # materialize the UNDIRECTED pairs first: the directed edge list is a
    # unionAll whose two legs would each re-execute the full
    # candidate-generation lineage (the blocked fuzzy join ran TWICE —
    # half of er_fuzzy_clusters' r08 wall); cutting before the union runs
    # it once, and the per-round joins then scan materialized blocks.
    # Lineage-cut rather than persist so blocks are GC-released, not
    # pinned forever.
    pairs = cut_lineage(pairs.select("id_a", "id_b"), checkpoint_dir)
    edges = (
        pairs.select(F.col("id_a").alias("_src"), F.col("id_b").alias("_dst"))
        .unionAll(
            pairs.select(
                F.col("id_b").alias("_src"), F.col("id_a").alias("_dst")
            )
        )
    )
    def hop(lbl: DataFrame) -> DataFrame:
        """One min-label propagation step.  Convergence is detected IN the
        projection (labels only ever decrease, so "changed" == "some
        neighbor label was strictly smaller") — the old separate
        new-vs-old join-count re-executed the round's join+agg a second
        time and doubled the per-round wall (r08 verdict:
        er_fuzzy_clusters 1.5 -> 2.9 s)."""
        nbr_labels = (
            edges.join(
                lbl.select(
                    F.col(id_col).alias("_src"),
                    F.col("canonical_id").alias("_nbr_label"),
                ),
                "_src",
            )
            .groupBy(F.col("_dst").alias(id_col))
            .agg(F.min("_nbr_label").alias("_best_nbr"))
        )
        return lbl.join(nbr_labels, id_col, "left").select(
            F.col(id_col),
            F.least(
                F.col("canonical_id"),
                F.coalesce(F.col("_best_nbr"), F.col("canonical_id")),
            ).alias("canonical_id"),
            (F.col("_best_nbr") < F.col("canonical_id")).alias("_changed"),
        )

    init = vertices.select(F.col(id_col), F.col(id_col).alias("canonical_id"))
    labels = cut_lineage(init, checkpoint_dir)
    # TWO hops per lineage cut: the cut (a full materialization) and the
    # convergence count are the per-round fixed costs, so pairing hops
    # halves them; the uncut intermediate hop only squares the bounded
    # plan (4 references to the materialized ``labels``, not 2^k — the
    # r08 OOM class needs unbounded compounding).  Convergence after the
    # SECOND hop alone is exact: labels are monotone non-increasing, so
    # one full step changing nothing is the fixpoint regardless of what
    # the first hop did.  ``max_iter`` still bounds HOPS, as before.
    hops_done = 0
    changed = -1
    while hops_done < max_iter:
        stepped = hop(labels)
        hops_done += 1
        if hops_done < max_iter:
            stepped = hop(stepped.select(id_col, "canonical_id"))
            hops_done += 1
        new_labels = cut_lineage(stepped, checkpoint_dir)
        changed = new_labels.filter(F.col("_changed")).count()
        # the hop projections above select explicit columns, so the extra
        # _changed column never enters the next round's shuffle
        labels = new_labels  # old frontier's blocks are GC-released
        if changed == 0:
            break
    else:
        # silently returning unconverged labels would be a WRONG answer
        # that still row-counts correctly — fail loudly instead (deep
        # chains mean max_iter was sized below the graph diameter)
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} hops "
            f"({changed} labels still changing) — raise max_iter"
        )
    return labels.select(F.col(id_col), F.col("canonical_id"))


def _simhash_votes(text: "Column | str") -> Column:
    """64-element ±1 vote vector: each distinct word is xxhash64'd ONCE and
    its 64 bits vote via shifts of the bound hash value (re-hashing the
    string per bit position would cost 64× more)."""
    hashed = F.transform(
        F.array_distinct(words(text)), lambda w: F.xxhash64(w)
    )
    return F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("int"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
                    ).cast("int")
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )


def _pack_votes(votes_slice: Column) -> Column:
    """Fold 32 votes into a packed bigint with (acc, place-value) state."""
    return F.aggregate(
        votes_slice,
        F.struct(
            F.lit(0).cast("bigint").alias("acc"),
            F.lit(1).cast("bigint").alias("pw"),
        ),
        lambda s, v: F.struct(
            (
                s.getField("acc")
                + F.when(v > 0, s.getField("pw")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("acc"),
            (s.getField("pw") * 2).alias("pw"),
        ),
        lambda s: s.getField("acc"),
    )


def simhash64(text: "Column | str") -> Column:
    """64-bit SimHash as two 32-bit halves ``struct(hi, lo)``.

    Per distinct word: xxhash64 → ±1 votes on 64 bit positions, summed with
    ``aggregate``/``zip_with`` (one pass over the token array, no explode,
    no shuffle); final bit *i* = (vote_i > 0).  Halves avoid BIGINT sign
    traps when reassembling the top bit.  NOTE: as a single expression the
    vote fold is evaluated once per half — prefer :func:`with_simhash` on
    DataFrames, which materializes the votes once.
    """
    votes = _simhash_votes(text)
    return F.struct(
        _pack_votes(F.slice(votes, 33, 32)).alias("hi"),
        _pack_votes(F.slice(votes, 1, 32)).alias("lo"),
    )


def with_simhash(
    df: DataFrame,
    text_col: str,
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
) -> DataFrame:
    """Attach SimHash halves with the vote vector materialized ONCE.

    The votes become a bound column that both packed halves reference —
    CollapseProject keeps multiply-referenced expensive expressions
    un-inlined, so the fold runs once per row instead of twice.
    """
    tmp = df.withColumn("_sh_votes", _simhash_votes(text_col))
    return (
        tmp.withColumn(hi_col, _pack_votes(F.slice(F.col("_sh_votes"), 33, 32)))
        .withColumn(lo_col, _pack_votes(F.slice(F.col("_sh_votes"), 1, 32)))
        .drop("_sh_votes")
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash64 structs (bit_count of XOR)."""
    return (
        F.bit_count(a.getField("hi").bitwiseXOR(b.getField("hi")))
        + F.bit_count(a.getField("lo").bitwiseXOR(b.getField("lo")))
    ).alias("hamming")


# ---------------------------------------------------------------------------
# Portable SimHash: engine-independent bits (cross-checkable against any SQL
# engine), unlike the xxhash64 variant above whose bit patterns are
# Spark-specific.  Shingles are hashed with md5 — natively codegen'd in
# Spark AND reproducible anywhere (a character-level rolling-hash fold was
# ~10× slower: Spark's higher-order functions are CodegenFallback, so
# per-character folds run interpreted) — giving a 62-bit signature as two
# 31-bit halves parsed from the two md5 hex halves.  Bigram (not unigram)
# features matter on low-entropy corpora: with a small vocabulary,
# distinct-unigram majority votes collapse to near-identical signatures;
# bigrams restore word-order sensitivity.
# ---------------------------------------------------------------------------

_PORTABLE_MASK = 2147483647  # low 31 bits — sign-safe shifts in BIGINT


def portable_gram_hashes(grams: Column, half: int) -> Column:
    """31-bit engine-portable hash per shingle: hex half ``half`` (1 or 2)
    of ``md5(w)`` parsed base-16, masked to 31 bits.  All codegen-native
    (md5/substring/conv), no interpreted fold."""
    off = 1 if half == 1 else 9
    return F.transform(
        grams,
        lambda w: F.conv(F.substring(F.md5(w), off, 8), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_PORTABLE_MASK)),
    )


def _portable_votes(hashes: Column) -> Column:
    """31-element ±1 vote vector over the bits of bound 31-bit hashes."""
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("int"), 31),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
                    ).cast("int")
                    for i in range(31)
                ]
            ),
            lambda a, v: a + v,
        ),
    )


def with_portable_simhash(
    df: DataFrame,
    text_col: str,
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
) -> DataFrame:
    """Attach a 62-bit engine-portable SimHash as two 31-bit BIGINT halves.

    Distinct word-bigram shingles → the two md5 hex halves per shingle
    (materialized ONCE as bound columns) → per-bit majority vote → packed
    halves.  Map-only: no explode, no shuffle — signatures stream out of the
    scan at 100 TB with zero data movement.
    """
    tmp = (
        df.withColumn("_pg", word_shingles(text_col, n=2))
        .withColumn("_ph1", portable_gram_hashes(F.col("_pg"), 1))
        .withColumn("_ph2", portable_gram_hashes(F.col("_pg"), 2))
    )
    return (
        tmp.withColumn(hi_col, _pack_votes(_portable_votes(F.col("_ph1"))))
        .withColumn(lo_col, _pack_votes(_portable_votes(F.col("_ph2"))))
        .drop("_pg", "_ph1", "_ph2")
    )


#: Disjoint band layout over the 62 signature bits: (half, offset, width).
#: 6 bands → pigeonhole guarantee: any pair with Hamming distance ≤ 5 shares
#: at least one band exactly, so banded candidate generation has 100% recall
#: at the ≤5 threshold (no probabilistic miss, unlike MinHash banding).
_SIMHASH_BANDS: list[tuple[str, int, int]] = [
    ("hi", 0, 10),
    ("hi", 10, 10),
    ("hi", 20, 11),
    ("lo", 0, 10),
    ("lo", 10, 10),
    ("lo", 20, 11),
]

#: 10-band layout (5 per half) over the 126-bit perceptual fingerprint
#: (two 63-bit halves).  Pigeonhole: recall is guaranteed through
#: Hamming ≤ 9 (= bands - 1).  Band width is the scale dial: 12/13-bit
#: bands give 4-8 k distinct values per band, so candidate volume is
#: ~Σ n²/2^12.6 instead of the n²/64 the previous 62-bit signature's
#: 6-bit bands degenerated to (r09 sf1-equivalent stress: 200 s wall at
#: 50 k docs, ~64× more candidate pairs than this layout).
_PHASH_BANDS: list[tuple[str, int, int]] = [
    ("hi", 0, 13),
    ("hi", 13, 13),
    ("hi", 26, 13),
    ("hi", 39, 12),
    ("hi", 51, 12),
    ("lo", 0, 13),
    ("lo", 13, 13),
    ("lo", 26, 13),
    ("lo", 39, 12),
    ("lo", 51, 12),
]


def simhash_banded_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 5,
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
    bands: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Near-dup pairs at ``Hamming ≤ max_hamming`` via band-bucket equi-join.

    Candidates come from exploding each signature into its 6 disjoint bit
    bands and self-joining on ``(band_index, band_value)`` — work scales with
    Σ bucket², never all-pairs.  The exact Hamming filter runs BEFORE the
    pair-dedup so ``distinct`` sees only surviving pairs.  ``max_hamming``
    may not exceed ``len(bands) - 1`` (the pigeonhole recall guarantee).

    At 1000× corpus scale the dial is band width: wider bands (more bits)
    shrink buckets and candidate volume at the cost of a lower guaranteed
    threshold — same trade the MinHash ``(bands, rows_per_band)`` pair
    exposes.
    """
    layout = bands if bands is not None else _SIMHASH_BANDS
    if max_hamming > len(layout) - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {len(layout)}-band "
            "pigeonhole guarantee (<= bands-1)"
        )
    half = {"hi": F.col(hi_col), "lo": F.col(lo_col)}
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(half[h], off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
            for i, (h, off, w) in enumerate(layout)
        ]
    )
    e = sigs.select(
        F.col(id_col),
        F.col(hi_col),
        F.col(lo_col),
        F.explode(band_arr).alias("b"),
    )
    a, b = e.alias("a"), e.alias("b")
    hamming = (
        F.bit_count(F.col(f"a.{hi_col}").bitwiseXOR(F.col(f"b.{hi_col}")))
        + F.bit_count(F.col(f"a.{lo_col}").bitwiseXOR(F.col(f"b.{lo_col}")))
    ).cast("bigint")
    return (
        a.join(
            b,
            (F.col("a.b.band") == F.col("b.b.band"))
            & (F.col("a.b.val") == F.col("b.b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _cw_params(k: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic Carter-Wegman (a, b) pairs — plain literals, so the
    static oracle SQL regenerates the identical family."""
    out = []
    x = seed
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = (x | 1) % _PORTABLE_MASK or 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % _PORTABLE_MASK
        out.append((a, b))
    return out


PORTABLE_MINHASH_CW = _cw_params(32)


def with_portable_minhash_bands(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    bands: int = 16,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, band-key array) with a fully ENGINE-PORTABLE MinHash: base
    hash = md5 hex half (restatable as ('0x'||substr(md5(g),1,8)) in
    ANSI-ish SQL), slot i = min over shingles of the Carter-Wegman mix
    (a_i*h + b_i) mod P, band j = sig[2j]*2^31 + sig[2j+1] (exact BIGINT
    pair encoding).  Unlike the xxhash64 production signature
    (minhash_signature), every band key is bit-identical cross-engine —
    the signature the certified recall row is built on.

    The gram-hash array is bound as a materialized column (an eager
    localCheckpoint) so the 32 slot-min folds share ONE md5 pass instead
    of CollapseProject inlining the hashing into every slot (the round-5
    signature-table blowup).  localCheckpoint rather than persist():
    repeated calls (one per streaming micro-batch in the ingest gate)
    would each pin a CacheManager entry forever, while checkpoint blocks
    are released by the ContextCleaner once the frame is GC'd.
    """
    hashed = docs.select(
        id_col,
        portable_gram_hashes(F.col(shingle_col), 1).alias("_hs"),
    ).localCheckpoint(eager=True)
    def _slot_min(a: int, b: int):
        # one-arg lambda: F.transform feeds the element index as a second
        # argument to 2-arg lambdas, which would clobber a default-bound i
        return F.array_min(
            F.transform(
                F.col("_hs"),
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_PORTABLE_MASK),
            )
        )

    sigs = [
        _slot_min(*PORTABLE_MINHASH_CW[i])
        for i in range(bands * rows_per_band)
    ]
    band_keys = [
        (
            sigs[j * rows_per_band] * F.lit(2147483648)
            + sigs[j * rows_per_band + 1]
        ).cast("bigint")
        for j in range(bands)
    ]
    return hashed.select(id_col, F.array(*band_keys).alias("band_keys"))


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard pairs at ``threshold`` via PPJoin-style positional
    prefix filtering — a lossless, skew-proof alternative to the
    all-shared-token candidate join.

    ``exact_ngram_pairs`` joins documents on EVERY shared shingle, so its
    candidate volume is Σ df² over the whole vocabulary — the frequent
    tokens (df in the millions at 100 TB) dominate and the join explodes
    exactly where the corpus is most redundant.  Prefix filtering orders
    each document's shingles by ascending global frequency (rarest first,
    ties on the token) and joins only on each side's PREFIX — the first
    ``|x| - ceil(t·|x|) + 1`` rarest tokens.  Losslessness: J(A,B) ≥ t
    implies |A∩B| ≥ t·|A| (since |A|+|B|-|A∩B| ≥ |A|), so the
    intersection cannot fit inside the ``ceil(t·|A|) - 1``-token suffix;
    the frequency-minimal common token therefore sits in BOTH prefixes
    (Chaudhuri et al.'s prefix-filtering theorem).  Candidate volume is
    Σ df² over prefix occurrences only — rare tokens by construction —
    and the frequent-token hot buckets vanish instead of being capped.

    A second lossless cut: J ≥ t also forces t·|A| ≤ |B| (and vice
    versa), applied as an integer length filter inside the join.  Exact
    verification re-attaches full shingle sets, so output = the exact
    all-pairs truth (same oracle), only the candidate route differs.
    """
    from pyspark.sql.window import Window

    from bakery_big_data_spark.operators.checkpointing import cut_lineage

    tok = docs.filter(F.size(shingle_col) > 0).select(
        F.col(id_col), F.explode(F.col(shingle_col)).alias("_tok")
    )
    dfreq = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))

    w = Window.partitionBy(id_col).orderBy(F.col("_df"), F.col("_tok"))
    sizes = docs.select(
        F.col(id_col), F.size(F.col(shingle_col)).alias("_n")
    )
    prefix = (
        tok.join(dfreq, "_tok")
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, id_col)
        .filter(
            F.col("_pos")
            <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
        )
        .select(F.col(id_col), "_tok", "_n")
    )
    # the prefix frame is self-joined below (two references); one
    # prefix-sized materialization stops the explode+df-join+window
    # pipeline re-executing per join side
    prefix = cut_lineage(prefix, None)
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("_tok"), F.col("_n").alias("_na")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("_tok"), F.col("_n").alias("_nb")
    )
    cands = (
        a.join(b, a["_tok"] == b["_tok"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_nb") >= F.ceil(F.lit(threshold) * F.col("_na")))
            & (F.col("_na") >= F.ceil(F.lit(threshold) * F.col("_nb")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_pairs(cands, docs, id_col, shingle_col, threshold)
