"""Gopher/C4 repetition-filter unit tests over HAND-BUILT documents.

The driver corpus is single-line lowercase prose, so the line-shaped
metrics (duplicate lines, bullets, ellipses) and the symbol ratio never
fire there; these synthetic docs exercise every branch, with expectations
computed by hand from the metric definitions in operators/repetition.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.repetition import (
    GOPHER_THRESHOLDS,
    repetition_features,
)

CLEAN = " ".join(f"tok{i} word{i % 7} item{i % 13}" for i in range(20))


def _features(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: r.asDict()
        for r in repetition_features(df, id_cols=["doc_id"]).collect()
    }


def test_clean_doc_passes(spark):
    feats = _features(spark, [(1, CLEAN)])[1]
    assert feats["passes_gopher"]
    assert feats["dup_line_frac"] == 0.0
    assert feats["bullet_line_frac"] == 0.0
    assert feats["ellipsis_line_frac"] == 0.0
    assert feats["symbol_word_ratio"] == 0.0
    assert feats["alpha_word_frac"] == 1.0
    assert feats["n_words"] == 60


def test_duplicate_lines_fail_gate(spark):
    # 6 lines, "same line" ×5 → 4 occurrences beyond first → dup 4/6
    text = "\n".join(["same line"] * 5 + [CLEAN])
    feats = _features(spark, [(1, text)])[1]
    assert feats["dup_line_frac"] == pytest.approx(4 / 6)
    assert not feats["passes_gopher"]


def test_bullet_and_ellipsis_lines(spark):
    text = "\n".join(
        ["- bullet one", "* bullet two", "trailing dots...", CLEAN]
    )
    feats = _features(spark, [(1, text)])[1]
    assert feats["bullet_line_frac"] == pytest.approx(2 / 4)
    assert feats["ellipsis_line_frac"] == pytest.approx(1 / 4)
    # under both line thresholds (0.9 / 0.3 needs < — 0.5 bullets pass,
    # 0.25 ellipses pass), so the verdict holds
    assert feats["passes_gopher"]


def test_symbol_ratio_fails(spark):
    words = CLEAN.split(" ")
    text = " ".join(w + "#" for w in words)  # one '#' per word → ratio 1.0
    feats = _features(spark, [(1, text)])[1]
    assert feats["symbol_word_ratio"] == pytest.approx(1.0)
    assert not feats["passes_gopher"]


def test_dominant_bigram_fails(spark):
    # "spam spam ... spam" — the bigram "spam spam" dominates
    text = " ".join(["spam"] * 60)
    feats = _features(spark, [(1, text)])[1]
    # 59 occurrences of 'spam spam' (9 chars) / 299 chars
    assert feats["top_2gram_char_frac"] == pytest.approx(59 * 9 / 299)
    assert feats["top_2gram_char_frac"] > GOPHER_THRESHOLDS[
        "max_top_2gram_char_frac"
    ]
    assert not feats["passes_gopher"]


def test_duplicated_5gram_share(spark):
    base = [f"w{i}" for i in range(10)]
    text = " ".join(base * 3)  # every 5-gram repeats
    feats = _features(spark, [(1, text)])[1]
    assert feats["dup_5gram_char_frac"] > 0.5
    assert not feats["passes_gopher"]


def test_short_and_nonalpha_docs(spark):
    feats = _features(
        spark, [(1, "too few words"), (2, " ".join(["123"] * 60))]
    )
    assert not feats[1]["passes_gopher"]  # word-count floor
    assert feats[2]["alpha_word_frac"] == 0.0
    assert not feats[2]["passes_gopher"]


def test_histogram_matches_python_on_corpus(spark, sf_dir):
    """Run-length n-gram histogram == a plain Python Counter on real docs."""
    from collections import Counter

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    feats = _features(spark, [(r.doc_id, r.text) for r in docs.collect()])
    for r in docs.collect():
        ws = r.text.split(" ")
        grams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        cnt = Counter(grams)
        top = max(c * len(g) for g, c in cnt.items())
        assert feats[r.doc_id]["top_2gram_char_frac"] == pytest.approx(
            top / len(r.text), rel=0, abs=0
        )
        g5 = Counter(
            " ".join(ws[i : i + 5]) for i in range(len(ws) - 4)
        )
        dup = sum((c - 1) * len(g) for g, c in g5.items() if c > 1)
        assert feats[r.doc_id]["dup_5gram_char_frac"] == pytest.approx(
            dup / len(r.text), rel=0, abs=0
        )
        assert not math.isnan(feats[r.doc_id]["mean_word_len"])
