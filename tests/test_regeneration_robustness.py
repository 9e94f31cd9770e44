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
    "funnel_conversion",
    "cohort_retention",
    "timeseries_gapfill",
    "anomaly_zscore_daily",
    "medallion_silver_transform",
    "medallion_feedback_silver",
    "medallion_incremental_parity",
    "curation_pipeline_manifest",
    "curation_incremental_parity",
    "text_repetition_filters",
    "multimodal_phash_fingerprint",
    "multimodal_phash_pairs",
    "embedding_int8_quantize",
    "embedding_random_projection",
    "json_variant_shred",
    "text_language_id",
    "text_quality_score",
    "text_scrub_patterns",
    "text_vocab_coverage",
    "curation_chunk_documents",
    "curation_mixture_upsample",
    "curation_stratified_sample",
    "curation_pack_sequences",
    "embedding_label_centroids",
    "similarity_topk_bruteforce",
    "embedding_cosine_near_dup_pairs",
    "similarity_ann_recall",
    "dedup_semantic_embedding",
    "dedup_cross_doc_spans",
    "dedup_semantic_recall",
    # round-8 continuation rows — each has a corpus-shape edge this
    # synthetic corpus hits directly: empty/one-word docs (phrase
    # adjacency, prefix filter, audio windows), duplicate (user, ts)
    # pairs (OHLC open/close tiebreak, zero-length TWA segments),
    # n < k (bottom-k quantile sample), < 10 distinct keys (top-10
    # share), single-day series (trend OLS zero denominator), a zero
    # embedding vector (PCA centering)
    "text_phrase_search",
    "dedup_prefix_filter_pairs",
    "multimodal_audio_quiet_segments",
    "timeseries_ohlc_bars",
    "timeseries_time_weighted_avg",
    "window_hopping_traffic",
    "sketch_bottomk_quantiles",
    "skew_profile_keys",
    "trend_linear_fit_daily",
    "embedding_pca_power_iteration",
    # round-8 second-window rows: MG heavy hitters (cardinality 5 < k —
    # the no-truncation path; every value below the sentinel threshold),
    # hybrid RRF (zero-norm query vector drops src0's semantic leg, a
    # source whose representative doc has NO embedding row drops src2's —
    # the fusion must survive lex-only sources)
    "sketch_misra_gries_heavy_hitters",
    "retrieval_hybrid_rrf",
    # NULL props + duplicate values stress the per-column distinct/null
    # counters
    "audit_column_profile",
    # 3-user corpus: tiny-n Wilson intervals (the small-sample case the
    # interval exists for)
    "ab_test_conversion_lift",
    # duplicate (user, ts) purchase/touch ties must resolve to the same
    # deterministic winner in both as-of implementations
    "attribution_last_touch",
    # duplicate (user, ts) events → zero-length sessions, shared sweep
    # instants; single-event sessions end where they start
    "sessions_peak_concurrency",
    # zero vector + single-point labels: a2 = 0 (point IS its centroid),
    # silhouette guard at max(a,b) = 0
    "clustering_silhouette_eval",
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


TPCH_QUERIES = [
    "pricing_summary_quality_gated",
    "daily_revenue_rollup",
    "group_stats_report",
    "join_inner_broadcast_dim",
    "join_left_outer_keep_unmatched",
    "join_multiway_star",
    "join_semi_anti_membership",
    "nation_market_share",
    "local_supplier_volume",
    "rfm_segmentation",
    "feature_quantile_binning",
    "window_sequence_keys",
    "topk_leaderboards",
    "window_rank_dense_ntile",
    "update_status_flip",
    "join_asof_latest_state",
    "join_asof_tolerance",
    "shipping_priority_topk",
    "sql_scalar_subquery",
    "sql_exists_subquery",
    "sql_correlated_min_subquery",
    "window_surrogate_keys",
    "window_partitioned_sequence",
    "pivot_status_matrix",
    "rollup_aggregation",
    "grouping_sets_matrix",
    "set_intersect_except",
    "unpivot_metrics",
    "collect_sorted_lists",
    "union_by_name_evolution",
    "window_distribution_ranks",
    "window_range_frame",
    # GD trainers: 100%/0% discounts stress the separable label rule
    # (d = q exactly at full discount) and the moment quantizers
    "ml_linear_regression_gd",
    "ml_logistic_classifier_gd",
    "ml_classifier_calibration",
    # same-date corpus: every trend NULL, seasonal COUNT = 0 — the NULLIF
    # guard (the trend-OLS single-day lesson, recurring shape)
    "timeseries_seasonal_decompose",
    # key-with-no-rows FDs, single-row groups, all-same amounts
    "audit_functional_dependencies",
    "audit_benford_first_digit",
    # empty-nation / no-lineitem orders: sparse disconnected trade graph
    "graph_sssp_weighted",
    # all-same-date corpus: every lag day absent (NULL forecasts), one
    # test day; single-part revenue concentrations
    "timeseries_forecast_backtest",
    "pareto_abc_classification",
]


@pytest.fixture(scope="module")
def adversarial_tpch_dir(spark, tmp_path_factory):
    """Plausible-adversarial TPC-H micro-corpus: a nation with no
    customers, a customer with no orders, an order with no lineitems,
    every order on the SAME date (total window ties), single-row groups,
    negative balances, 100% and 0% discounts."""
    base = tmp_path_factory.mktemp("regen_tpch")
    ts = datetime.datetime(1996, 6, 1)

    spark.createDataFrame(
        [(i, f"R{i}") for i in range(5)], "r_regionkey LONG, r_name STRING"
    ).coalesce(1).write.parquet(str(base / "region.parquet"))
    # AMERICA present so nation_market_share's filter has a live branch
    spark.sql(
        "SELECT * FROM VALUES (0,'NATION_0',0),(1,'NATION_1',0),"
        "(2,'NATION_3',1),(3,'EMPTY_NATION',2) AS "
        "t(n_nationkey, n_name, n_regionkey)"
    ).coalesce(1).write.parquet(str(base / "nation.parquet"))
    spark.sql("SELECT 0 AS r_regionkey, 'AMERICA' AS r_name").unionAll(
        spark.sql("SELECT 1, 'ASIA'")
    ).unionAll(spark.sql("SELECT 2, 'EUROPE'")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(base / "region.parquet"))

    cust = [
        # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        (0, "Customer#000000000", 0, -999.99, "BUILDING"),  # negative bal
        (1, "Customer#000000001", 0, 0.0, "BUILDING"),      # tie at zero
        (2, "Customer#000000002", 1, 0.0, "AUTOMOBILE"),    # tie at zero
        (3, "Customer#000000003", 2, 500.5, "MACHINERY"),   # no orders
    ]
    spark.createDataFrame(
        cust,
        "c_custkey LONG, c_name STRING, c_nationkey LONG, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    ).coalesce(1).write.parquet(str(base / "customer.parquet"))

    spark.createDataFrame(
        [(0, "Supplier#0", 2), (1, "Supplier#1", 1)],
        "s_suppkey LONG, s_name STRING, s_nationkey LONG",
    ).coalesce(1).write.parquet(str(base / "supplier.parquet"))

    spark.createDataFrame(
        [(0, "part0", "B", "PROMO", 1, 10.0), (1, "part1", "B", "SMALL", 2, 20.0)],
        "p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).coalesce(1).write.parquet(str(base / "part.parquet"))

    orders = [
        # every order the SAME date: all window orderings need tiebreaks
        (0, 0, "O", 100.0, ts, "1-URGENT"),
        (1, 0, "F", 100.0, ts, "2-HIGH"),   # duplicate totalprice tie
        (2, 1, "O", 50.0, ts, "3-MEDIUM"),
        (3, 2, "P", 0.0, ts, "4-NOT SPECIFIED"),  # zero-value order
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.parquet(str(base / "orders.parquet"))

    li = [
        # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
        #  returnflag, linestatus, shipdate, commitdate, receiptdate)
        (0, 0, 0, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts, ts, ts),   # 0% disc
        (0, 1, 1, 2, 2.0, 40.0, 1.0, 0.1, "R", "F", ts, ts, ts),   # 100% disc
        (1, 0, 0, 1, 5.0, 50.0, 0.5, 0.2, "A", "F", ts, ts, ts),
        # order 2 and 3 have NO lineitems (outer-join edge)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
        "l_shipdate TIMESTAMP, l_commitdate TIMESTAMP, "
        "l_receiptdate TIMESTAMP",
    ).coalesce(1).write.parquet(str(base / "lineitem.parquet"))

    # a minimal events table for the multi-table report (one event type
    # with a single row: stddev of n=1 is NULL — both engines must agree)
    spark.createDataFrame(
        [
            (0, ts, 0, "view", 1.5, '{"k": 1}'),
            (1, ts, 0, "view", 2.5, '{"k": 2}'),
            (2, ts, 1, "click", 9.0, '{"k": 3}'),
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(str(base / "events.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def adversarial_tpch_con(adversarial_tpch_dir):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events",
    ):
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{adversarial_tpch_dir}/{name}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_relational_query_survives_adversarial_tpch(
    name, spark, adversarial_tpch_dir, adversarial_tpch_con
):
    q = REGISTRY[name]
    compare(q.build(spark, adversarial_tpch_dir), adversarial_tpch_con, q.oracle)
