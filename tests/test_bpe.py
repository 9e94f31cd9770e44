"""BPE vocabulary induction vs an independent pure-Python reference fold.

The DuckDB oracle already certifies the registered query cross-engine;
this test pins the SEMANTICS against a third, dependency-free
implementation of Sennrich-style BPE (overlapping pair counts, lexicographic
tie-break, greedy left-to-right merge) on corpora crafted to exercise the
corner cases: overlapping pairs ("aaa"), merged-symbol recombination in
later rounds, ties, and 1-char words.
"""

from __future__ import annotations

from collections import Counter


def _py_bpe(texts: list[str], k: int):
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): f for w, f in words.items()}
    out = []
    for rnd in range(1, k + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties -> lexicographically smallest (l, r)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        out.append((rnd, left, right, left + right, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return out


def _spark_bpe(spark, texts: list[str], k: int):
    from bakery_big_data_spark.operators.bpe import bpe_merge_table

    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    return sorted(
        tuple(r) for r in bpe_merge_table(df, "text", num_merges=k).collect()
    )


def test_bpe_overlaps_ties_and_recombination(spark):
    # "aaa" -> (a,a) counts 2 per occurrence but merges to ["aa","a"];
    # repeated rounds must allow "aa"+"a" and merged-symbol recombination.
    texts = ["aaa aaa ab", "aaa ab b a"]
    assert _spark_bpe(spark, texts, 3) == sorted(_py_bpe(texts, 3))


def test_bpe_lexicographic_tiebreak(spark):
    # "ba" and "ab" pair counts tie -> (a,b) must win over (b,a)
    texts = ["ab ba", "ab ba"]
    got = _spark_bpe(spark, texts, 1)
    assert got == sorted(_py_bpe(texts, 1))
    assert got[0][1:3] == ("a", "b")


def test_bpe_multichar_merge_chain(spark):
    # force l-o, then lo-w (merged symbol on the LEFT of a later merge)
    texts = ["low low low lower", "low lowest"]
    assert _spark_bpe(spark, texts, 4) == sorted(_py_bpe(texts, 4))


def test_bpe_single_char_words_and_blanks(spark):
    texts = ["a  b   a b", "ab  a"]  # double spaces -> empty tokens dropped
    assert _spark_bpe(spark, texts, 2) == sorted(_py_bpe(texts, 2))


from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="ab", min_size=1, max_size=5)


@given(
    texts=st.lists(
        st.lists(_WORD, min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(1, 4),
)
@settings(max_examples=5, deadline=None, derandomize=True)
def test_bpe_matches_python_reference_on_random_corpora(spark, texts, k):
    """Random tiny-alphabet corpora maximize tie and overlap pressure
    (everything is 'a'/'b' runs); the Spark merge table must equal the
    pure-Python fold INCLUDING when the vocab exhausts before k merges —
    both sides stop early at the exhaustion round."""
    ref = _py_bpe(texts, k)
    if not ref:
        return  # zero learnable merges: bpe_merge_table raises (tested below)
    assert _spark_bpe(spark, texts, k) == sorted(ref)


def test_bpe_early_stop_on_exhausted_pairs(spark):
    """num_merges beyond the achievable merges must stop early with the
    merges actually learned — NOT silently empty the vocabulary (the
    pre-guard failure mode: empty argmax cross-joined onto the vocab
    dropped every word, and bpe_token_counts returned zero rows)."""
    from bakery_big_data_spark.operators.bpe import (
        bpe_merge_table,
        bpe_token_counts,
    )

    # "ab ab" exhausts after one merge: a+b -> ab, then no pairs remain
    df = spark.createDataFrame([("d1", "ab ab"), ("d2", "ab")],
                               "doc_id STRING, text STRING")
    merges = bpe_merge_table(df, "text", num_merges=10).collect()
    assert [tuple(r) for r in merges] == _py_bpe(["ab ab", "ab"], 10)
    assert len(merges) == 1
    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(df, "doc_id", "text", num_merges=10).collect()
    }
    assert counts == {"d1": (2, 2), "d2": (1, 1)}


def test_bpe_raises_on_unlearnable_corpus(spark):
    import pytest

    from bakery_big_data_spark.operators.bpe import bpe_merge_table

    df = spark.createDataFrame([("a b a",)], "text STRING")
    with pytest.raises(ValueError, match="no adjacent symbol pairs"):
        bpe_merge_table(df, "text", num_merges=3)


def test_reliable_checkpoint_same_result(spark, tmp_path):
    """checkpoint_dir mode (reliable .checkpoint() per round) must be
    bit-identical to the default localCheckpoint mode."""
    from bakery_big_data_spark.operators.bpe import (
        bpe_merge_table,
        bpe_token_counts,
    )

    rows = [(f"d{i}", "low lower lowest ab ba aaa" * (i % 3 + 1))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING")
    local = sorted(tuple(r) for r in bpe_merge_table(df, "text", 6).collect())
    reliable = sorted(
        tuple(r)
        for r in bpe_merge_table(
            df, "text", 6, checkpoint_dir=str(tmp_path / "bpe_ckpt")
        ).collect()
    )
    assert local == reliable
    enc_local = sorted(
        tuple(r) for r in bpe_token_counts(df, "doc_id", "text", 6).collect()
    )
    enc_reliable = sorted(
        tuple(r)
        for r in bpe_token_counts(
            df, "doc_id", "text", 6,
            checkpoint_dir=str(tmp_path / "bpe_ckpt2"),
        ).collect()
    )
    assert enc_local == enc_reliable
