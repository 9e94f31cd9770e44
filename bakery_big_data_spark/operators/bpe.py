"""BPE vocabulary induction — iterative most-frequent-pair merges.

Sennrich et al. 2016 (arXiv:1508.07909) byte-pair-encoding vocabulary
learning, the missing piece above the catalog's BPE-ish pretokenizer
(:data:`bakery_big_data_spark.plans.textops._BPE_ISH_RE`): starting from
the corpus WORD-FREQUENCY table (the classic formulation — merges operate
on aggregated word shapes, never on the raw token stream), repeat ``k``
times:

1. count adjacent symbol pairs, weighted by word frequency (every
   adjacent occurrence counts, matching the reference implementation's
   ``get_stats``);
2. pick the globally most frequent pair, ties broken lexicographically on
   ``(left, right)`` so the merge sequence is a pure function of the
   corpus;
3. merge that pair greedily left-to-right inside every word.

Scale shape (100 TB): the ONLY corpus-scale work is the initial word
count — one map-side-combinable shuffle that compacts the corpus to its
vocabulary (|distinct words| << corpus).  Every round after that is
O(vocab): a pair aggregation over the compacted frame (map-side
combinable), a TakeOrdered(1) for the argmax, and a map-only fold that
rewrites each word's symbol array.  The argmax is a lazy 1-row broadcast
cross onto the vocab frame — no driver round trip; the whole k-round
merge table materializes in one action.

The greedy left-to-right merge is a single ``F.aggregate`` fold over the
symbol array: append the next symbol unless the accumulator's last
element equals ``left`` and the next symbol equals ``right``, in which
case replace the last element with ``left||right``.  A fold pass is
exactly the non-overlapping left-to-right replacement the reference
implementation performs with its regex substitution ("aaa" + (a,a) ->
["aa","a"], never ["a","aa"] or ["aaa"]).

Reference parity: the reference engine has no vocabulary induction; this
is part of the training-data-pipeline extension family (SURVEY.md §6).

Lineage control: each round consumes the previous round's frame TWICE
(pair counts + merge rewrite), so the logical plan doubles per round —
``persist`` alone short-circuits execution but Catalyst still analyzes
the full 2^k-node tree (observed: OOM stringifying the plan at k=8).
Each round therefore cuts lineage via
:func:`bakery_big_data_spark.operators.checkpointing.cut_lineage`: k
bounded vocab-sized materializations, the same driver-loop class as
``operators/dedup.py::connected_components`` (iterative algorithm with
bounded rounds, no data round-trip to the driver).  By default the cut is
a ``localCheckpoint`` (executor-storage blocks, no filesystem I/O); on a
multi-executor cluster executor loss invalidates those blocks, so a
production run of a long merge schedule passes ``checkpoint_dir`` to use
reliable ``.checkpoint()`` instead, at the cost of writing the vocab
frame to fault-tolerant storage per round — bit-identical results either
way (``tests/test_bpe.py::test_reliable_checkpoint_same_result``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.checkpointing import cut_lineage


def _adjacent_sym_pairs(syms: Column) -> Column:
    """Adjacent (l, r) pairs of a symbol array; empty for 1-symbol words
    (guarding Spark's descending ``sequence(1, 0)``)."""
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, i + 1).alias("r"),
        ),
    )


def merge_pair_fold(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) inside
    a symbol array, as one JVM-side fold — no UDF, no explode/re-group."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == left) & (s == right),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequency_table(corpus: DataFrame, text_col: str) -> DataFrame:
    """Whitespace word counts with each word split into its character
    symbols — the compacted frame all merge rounds operate on.  The word
    string rides along as the join key for the encode step."""
    return (
        corpus.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("w", F.split("w", "").alias("syms"), "freq")
    )


def bpe_rounds(
    corpus: DataFrame,
    text_col: str,
    num_merges: int = 8,
    checkpoint_dir: str | None = None,
) -> tuple[list[DataFrame], DataFrame]:
    """Run the merge loop; returns (per-round 1-row argmax frames, the
    final encoded vocabulary ``(w, syms, freq)``).

    If ``num_merges`` exceeds the achievable merges (every word fully
    merged to one symbol — tiny/degenerate corpora), the loop STOPS
    EARLY at the exhaustion round, matching reference BPE trainers;
    without the guard the empty argmax cross-joined onto the vocab would
    silently empty it and every downstream document would be dropped.
    The per-round argmax frame is already materialized (persist + the
    round's eager lineage cut), so the emptiness probe is a count on a
    pinned 1-row frame, not an extra corpus pass.

    ``checkpoint_dir`` selects reliable vs local per-round lineage cuts
    (see :mod:`bakery_big_data_spark.operators.checkpointing`).
    """
    cur = cut_lineage(word_frequency_table(corpus, text_col), checkpoint_dir)
    bests: list[DataFrame] = []
    for r in range(1, num_merges + 1):
        pairs = (
            cur.select(
                F.explode(_adjacent_sym_pairs(F.col("syms"))).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        # persist (not checkpoint): best's plan is SHALLOW — one agg over
        # the checkpointed vocab frame — so pinning the 1-row result is
        # enough; lineage stays O(1) because cur below is checkpointed
        best = (
            pairs.orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .persist()
        )
        if best.count() == 0:
            # pair space exhausted before num_merges rounds — stop with
            # the merges actually learned rather than emptying the vocab
            best.unpersist()
            break
        bests.append(
            best.select(
                F.lit(r).alias("merge_round"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged_sym"),
                "pair_count",
            )
        )
        bb = F.broadcast(
            best.select(F.col("l").alias("_bl"), F.col("r").alias("_br"))
        )
        cur = cut_lineage(
            cur.crossJoin(bb).select(
                "w",
                merge_pair_fold(
                    F.col("syms"), F.col("_bl"), F.col("_br")
                ).alias("syms"),
                "freq",
            ),
            checkpoint_dir,
        )
    return bests, cur


def bpe_merge_table(
    corpus: DataFrame,
    text_col: str,
    num_merges: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the ordered merge table
    ``(merge_round, left_sym, right_sym, merged_sym, pair_count)``."""
    bests, _ = bpe_rounds(corpus, text_col, num_merges, checkpoint_dir)
    if not bests:
        raise ValueError(
            "bpe_merge_table: corpus has no adjacent symbol pairs at all "
            "(empty or single-character words only) — nothing to learn"
        )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def bpe_token_counts(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_merges: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """APPLY the learned merges — distributed BPE tokenization: per
    document, the whitespace word count and the token count after
    ``num_merges`` merges.

    The encode step is a broadcast join of the corpus word stream against
    the encoded VOCABULARY (word → merged-symbol count) — the learned
    segmentation of each distinct word is computed exactly once during
    the merge loop, so tokenizing the corpus costs one map-side join +
    one per-doc aggregation, never a per-document re-fold.  This is how
    production BPE tokenizers scale: encode the vocab, then stream the
    corpus through it."""
    _, vocab = bpe_rounds(corpus, text_col, num_merges, checkpoint_dir)
    return bpe_encode_counts(vocab, corpus, id_col, text_col)


def bpe_encode_counts(
    vocab: DataFrame, corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The encode join alone, against an already-learned vocabulary —
    the entry point for callers that memoize the merge loop's outputs
    (plans/textops.py shares one learned vocab between the learn row and
    the encode row)."""
    vsize = vocab.select("w", F.size("syms").alias("_n_sym"))
    words = corpus.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.join(F.broadcast(vsize), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n_sym").alias("n_bpe_tokens"),
        )
    )
