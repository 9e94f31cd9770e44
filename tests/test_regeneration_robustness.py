"""Adversarial-regeneration guard: the driver regenerates testdata between
rounds, and every past cross-round breakage (NANOS→NTZ timestamps, short
docs vs descending sequence(), duplicate (user, ts) session ties, NULL
snapshot fields) was a data-shape shift the fixed corpus never exercised.

This suite synthesizes a deliberately pathological corpus — one-word and
EMPTY documents, single-char text, duplicate (user_id, ts) event pairs,
NULL props, a zero embedding vector, a lang stratum with one doc — writes
it in the testdata layout, and runs the most shape-sensitive catalog
queries against their own DuckDB oracles on it.  A query that only works
on the current generator's distributions fails HERE, one round early.
"""

from __future__ import annotations

import datetime

import pytest

from bakery_big_data_spark.plans import REGISTRY
from tests.oracle import compare, duck_connect

#: shape-sensitive, batch-only (no scratch/streaming state), and readable
#: from just documents/events/embeddings.
QUERIES = [
    "text_token_stats",
    "text_bigram_lm_counts",
    "text_lm_quality_score",
    "text_fingerprint_rolling_hash",
    "text_tfidf_top_terms",
    "text_analysis_profile",
    "dedup_exact_content",
    "dedup_exact_normalized",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_canonical_assignment",
    "dedup_connected_components",
    "dedup_simhash_banded_pairs",
    "curation_hash_split",
    "curation_filter_funnel",
    "curation_pps_sample",
    "curation_length_histogram",
    "sessionize_events",
    "session_window_agg",
    "embedding_int8_quantize",
    "embedding_random_projection",
    "json_variant_shred",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("regen")
    docs = [
        # (doc_id, text, lang, source, n_chars)
        (0, "", "en", "src0", 0),                      # empty text
        (1, "x", "en", "src0", 1),                     # one 1-char word
        (2, "hello", "de", "src0", 5),                 # one word → no bigrams
        (3, "a b", "en", "src1", 3),                   # exactly one bigram
        (4, "the the the the", "en", "src1", 15),      # all-repeat tokens
        (5, "Hello,  WORLD!! x", "fr", "src1", 17),    # punct/case/ws
        (6, "one two three four five six", "es", "src2", 27),
        (7, "one two three four five six", "es", "src2", 27),  # exact dup
        (8, "one two three four five seven", "es", "src2", 29),  # near dup
        (9, "solo", "zh", "src2", 4),                  # 1-doc lang stratum
    ]
    spark.createDataFrame(
        docs, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).coalesce(1).write.parquet(str(base / "documents.parquet"))

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    ev = []
    for i in range(40):
        # duplicate (user_id, ts) pairs on every 4th event — session
        # cumsum ordering must tiebreak on event_id
        ts = t0 + datetime.timedelta(minutes=(i // 4) * 20)
        ev.append(
            (
                i,
                ts,
                i % 3,
                ["view", "click", "purchase", "signup", "error"][i % 5],
                float(i) / 7.0,
                None if i % 7 == 0 else '{"k": %d}' % (i * 3),
            )
        )
    spark.createDataFrame(
        ev,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(str(base / "events.parquet"))

    vecs = [
        (0, [0.0] * 64, 0),                             # zero vector
        (1, [1.0] + [0.0] * 63, 1),
        (2, [float(j % 5) / 3.0 for j in range(64)], 2),
        (3, [-float(j % 7) / 2.0 for j in range(64)], 0),
    ]
    spark.createDataFrame(
        vecs, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    ).coalesce(1).write.parquet(str(base / "embeddings.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def adversarial_con(adversarial_dir):
    import duckdb

    con = duckdb.connect()
    for name in ("documents", "events", "embeddings"):
        # Spark writes each table as a directory of part files
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{adversarial_dir}/{name}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_query_survives_adversarial_corpus(
    name, spark, adversarial_dir, adversarial_con
):
    q = REGISTRY[name]
    compare(q.build(spark, adversarial_dir), adversarial_con, q.oracle)
