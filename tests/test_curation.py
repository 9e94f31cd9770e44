"""Behavioral tests for the dataset-curation family (plans/curation.py).

The DuckDB value-hash check lives in tests/test_catalog.py; these assert the
curation-specific invariants the oracle can't express: split determinism and
proportions, benchmark/corpus disjointness, and funnel monotonicity.
"""

from __future__ import annotations

from bakery_big_data_spark.plans import REGISTRY


def test_hash_split_deterministic_and_proportioned(spark, sf_dir):
    q = REGISTRY["curation_hash_split"]
    rows = {r.doc_id: r.split for r in q.build(spark, sf_dir).collect()}
    again = {r.doc_id: r.split for r in q.build(spark, sf_dir).collect()}
    assert rows == again  # pure function of the key

    n = len(rows)
    counts = {s: sum(1 for v in rows.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == n
    # 80/10/10 targets; multiplicative-hash uniforms at n=500 land within ±6%.
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts["val"] / n - 0.1) < 0.06
    assert abs(counts["test"] / n - 0.1) < 0.06


def test_contamination_excludes_benchmark_and_bounds(spark, sf_dir):
    df = REGISTRY["curation_contamination_check"].build(spark, sf_dir)
    rows = df.collect()
    assert all(r.doc_id % 25 != 0 for r in rows)  # corpus only
    assert all(0.0 <= r.contamination_ratio <= 1.0 for r in rows)
    assert all(r.n_shared <= r.n_grams for r in rows)
    # The shared 30-word vocabulary guarantees trigram collisions exist.
    assert any(r.n_shared > 0 for r in rows)


def test_filter_funnel_monotone(spark, sf_dir):
    r = REGISTRY["curation_filter_funnel"].build(spark, sf_dir).collect()[0]
    assert r.n_total >= r.n_len >= r.n_len_ttr >= r.n_len_ttr_lang >= 0
    assert 0 < r.n_len_ttr_lang < r.n_total  # thresholds are non-degenerate
    assert abs(r.retention - r.n_len_ttr_lang / r.n_total) < 1e-12


def test_stratified_sample_layout_independent(spark, sf_dir):
    """The 100 TB claim: sample membership is a pure function of doc_id —
    identical under any partition layout (this is exactly what
    df.sample/sampleBy cannot promise across differing input splits)."""
    from bakery_big_data_spark.plans.curation import _LCG_M, _SAMP_A, _SAMP_C
    from bakery_big_data_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    d = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id").cast("bigint") * _SAMP_A + F.lit(_SAMP_C)) % _LCG_M) / float(
        _LCG_M
    )
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.3)
        .when(F.col("lang") == "fr", 0.2)
        .otherwise(0.1)
    )
    pick = lambda df: {  # noqa: E731
        r.doc_id for r in df.select("doc_id", "lang").withColumn("u", u)
        .withColumn("rate", rate).filter(F.col("u") < F.col("rate"))
        .select("doc_id").collect()
    }
    assert pick(d.repartition(3)) == pick(d.repartition(11)) == pick(d.coalesce(1))


def test_chunking_conserves_and_rebuilds(spark, sf_dir):
    """Chunk token counts sum to the doc's token count, every chunk except
    the last is full, and re-joining chunks in index order rebuilds the
    exact original text."""
    import pyspark.sql.functions as F

    from bakery_big_data_spark.plans.curation import _CHUNK
    from bakery_big_data_spark.sources.tables import load_table

    chunks = REGISTRY["curation_chunk_documents"].build(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_chunk_tokens").alias("tok_sum"),
            F.max("chunk_idx").alias("last_idx"),
            F.min(
                F.when(F.col("n_chunk_tokens") < _CHUNK, F.col("chunk_idx"))
            ).alias("first_partial"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_tokens")
    )
    j = per_doc.join(docs, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r.tok_sum == r.n_tokens
        # only the final chunk may be partial
        assert r.first_partial is None or r.first_partial == r.last_idx
        assert r.rebuilt == r.text


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing moves every token into exactly one pack: per-shard pack token
    totals equal the shard's raw token totals, and every pack except a
    shard's last is filled past the budget boundary it started before."""
    import pyspark.sql.functions as F

    from bakery_big_data_spark.sources.tables import load_table

    packs = REGISTRY["curation_pack_sequences"].build(spark, sf_dir)
    per_shard = packs.groupBy("shard").agg(
        F.sum("n_tokens").alias("packed"), F.sum("n_docs").alias("n_docs")
    )
    raw = (
        load_table(spark, sf_dir, "documents")
        .select(
            (F.col("doc_id") % 8).alias("shard"),
            F.size(F.split("text", " ")).alias("n"),
        )
        .groupBy("shard")
        .agg(F.sum("n").alias("raw"), F.count(F.lit(1)).alias("n_docs_raw"))
    )
    for r in per_shard.join(raw, "shard").collect():
        assert r.packed == r.raw
        assert r.n_docs == r.n_docs_raw


def test_dsir_selects_target_like_documents(spark, sf_dir):
    """DSIR semantics: the resampled top-k must look MORE like the target
    domain than the raw pool does.  Proxy for 'looks like': mean per-doc
    score under the target/proposal bucket-ratio model, which for the
    TRUE target docs is by construction high — so the selected non-target
    docs should score above the average non-target doc, and selection
    must be deterministic (no rand(), no layout dependence)."""
    from bakery_big_data_spark.plans import REGISTRY

    q = REGISTRY["curation_dsir_resample"]
    sel = {r.doc_id: r.dsir_score_q for r in q.build(spark, sf_dir).collect()}
    again = {r.doc_id: r.dsir_score_q for r in q.build(spark, sf_dir).collect()}
    assert sel == again  # deterministic top-k, stable across runs

    assert len(sel) == 100
    assert all(s > 0 for s in sel.values())  # add-one smoothing floor

    # Selected docs must come from the raw pool only (target excluded).
    from bakery_big_data_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = {r.doc_id: r.source for r in docs.collect()}
    assert all(src[d] != "src0" for d in sel)

    # Top-100 mean score strictly exceeds the raw-pool mean score: the
    # importance weighting actually orders docs by target-likeness
    # rather than returning an arbitrary subset.  Recompute every
    # non-target doc's score by removing the LIMIT via the oracle SQL.
    import duckdb

    con = duckdb.connect()
    for n in ("documents",):
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM '{sf_dir}/{n}.parquet'"
        )
    full = con.execute(
        q.oracle.replace("LIMIT 100", "LIMIT 1000000000")
    ).fetchall()
    all_scores = [r[1] for r in full]
    sel_mean = sum(sel.values()) / len(sel)
    pool_mean = sum(all_scores) / len(all_scores)
    assert sel_mean > pool_mean
