"""Streaming near-duplicate ingest gate — dedup-at-the-well.

The production shape for dedup at 100 TB: instead of landing the whole
corpus and deduplicating in batch, each ingest micro-batch is checked
against the accumulated LSH band index and every document receives its
keep/drop verdict AT ARRIVAL.  One Structured Streaming query:
``foreachBatch`` shingles the new documents, probes their MinHash band
hashes against the band-state table (plus the batch's own bands, for
intra-batch duplicates), exact-Jaccard-verifies the candidates, and
commits three state tables — band index, shingle store, decisions — each
guarded by the micro-batch id inside the snapshot commit (checkpoint
re-delivery is exactly-once).

Equivalence to the batch canonicalization (the certified property) holds
under ANY arrival order: each banded pair is caught when its
later-arriving partner probes the index (candidates run in BOTH id
directions), and when the smaller partner arrives late the
already-committed decision row is revised (late canonical demotion — an
admitted doc can be superseded, the production reality of unordered
ingest).  ``canonical_id`` therefore accumulates ``LEAST(self, MIN(all
verified banded neighbors))`` across arrivals — exactly the batch star
contraction — and under doc-id-ordered replay the demotion step is
provably a no-op (no smaller partner can arrive late), so the certified
registered row is unchanged.
``tests/test_pipeline.py::test_streaming_dedup_gate_out_of_order``
asserts shuffled-arrival decisions equal ordered-arrival decisions.  ``streaming_dedup_ingest_gate`` hash-certifies the
full decision table against a BANDING-AWARE oracle: the gate uses the
engine-portable MinHash (md5-half base + Carter-Wegman slots,
``with_portable_minhash_bands`` — the signature the certified recall row
is built on) so DuckDB re-derives the identical band keys and applies
the identical candidate predicate.  Certification therefore holds at
every scale factor; an all-pairs oracle would only match where banding
recall is incidentally 100% (it is 25/25 at sf0.01 but 251/256 at
sf0.1 — ``dedup_minhash_recall``).

Parameters mirror the batch path exactly (trigram shingles, 32-slot
MinHash, 16 bands x 2 rows, Jaccard >= 0.5).  Per-batch work is
Δ-shaped: new docs shingle once (map-only), the probe is a band-bucket
equi-join of the NEW bands against the index (never all-pairs), and
verification touches only new candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ordered_json_chunks(
    df: DataFrame,
    src: str,
    order_col: str,
    n_chunks: int,
    arrival_rank: list[int] | None = None,
    json_options: dict[str, str] | None = None,
) -> None:
    """Materialize ``df`` as ``n_chunks`` JSON-lines files partitioned by
    contiguous ``order_col`` ranges, with strictly increasing mtimes so
    the file stream source delivers them as chronological arrivals.
    ``arrival_rank[ci]`` overrides chunk ``ci``'s delivery position
    (out-of-order arrival testing); default is in-range order.
    Idempotent via a ``_done`` marker (older mtime than every data file —
    the marker must not become a later 'arrival')."""
    import os
    import shutil

    if os.path.exists(f"{src}/_done"):
        return
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    lo_hi = df.agg(F.min(order_col), F.max(order_col)).collect()[0]
    lo_all, hi_all = int(lo_hi[0]), int(lo_hi[1])
    span = hi_all - lo_all + 1
    bounds = [lo_all + span * i // n_chunks for i in range(n_chunks + 1)]
    stamp = 1_600_000_000
    for ci in range(n_chunks):
        clo, chi = bounds[ci], bounds[ci + 1] - 1
        if chi < clo:
            continue
        part = df.filter(F.col(order_col).between(clo, chi))
        tmp = f"{src}/_tmp{ci}"
        part.select(
            F.to_json(F.struct(*part.columns), json_options or {}).alias(
                "value"
            )
        ).coalesce(1).write.mode("overwrite").text(tmp)
        pf = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".txt")
        )
        dst = f"{src}/{ci:03d}.json"
        os.replace(f"{tmp}/{pf}", dst)
        shutil.rmtree(tmp)
        rank = arrival_rank[ci] if arrival_rank is not None else ci
        os.utime(dst, (stamp + rank, stamp + rank))
    with open(f"{src}/_done", "w") as fh:
        fh.write("ok")
    os.utime(f"{src}/_done", (stamp - 10, stamp - 10))


def run_streaming_dedup_gate(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_chunks: int = 4,
    arrival_rank: list[int] | None = None,
) -> DataFrame:
    """Replay ``documents`` as ``n_chunks`` doc-id-range JSON arrivals
    through the ingest gate (``arrival_rank`` shuffles delivery order);
    returns the decision table ``(doc_id, canonical_id, is_kept)``
    covering every document."""
    from bakery_big_data_spark.operators.dedup import (
        verify_pairs,
        with_portable_minhash_bands,
        word_shingles,
    )
    from bakery_big_data_spark.sources.snapshots import (
        last_commit_meta,
        read_snapshot,
        table_exists,
        write_snapshot,
    )
    from bakery_big_data_spark.sources.tables import load_table
    from bakery_big_data_spark.streaming.ingest import read_json_stream

    src = f"{base_path}/stream_src"
    ckpt = f"{base_path}/ckpt"
    band_path = f"{base_path}/band_state"
    sh_path = f"{base_path}/shingle_state"
    dec_path = f"{base_path}/decisions"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_ordered_json_chunks(docs, src, "doc_id", n_chunks, arrival_rank)

    def _applied(path: str, bi: int) -> bool:
        meta = last_commit_meta(path)
        return meta is not None and meta.get("batch", -1) >= bi

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bi = int(batch_id)
        if all(_applied(p, bi) for p in (band_path, sh_path, dec_path)):
            return  # checkpoint re-delivery of a fully-applied batch
        feat = batch_df.select(
            "doc_id", word_shingles("text", n=3).alias("shingles")
        ).localCheckpoint()  # one materialization: probed + verified + stored
        new_bands = (
            with_portable_minhash_bands(
                feat.filter(F.size("shingles") > 0), "doc_id", "shingles"
            )
            .select(
                "doc_id",
                F.posexplode("band_keys").alias("band_idx", "band_hash"),
            )
            .localCheckpoint()
        )

        index = (
            read_snapshot(spark, band_path).unionByName(new_bands)
            if table_exists(band_path)
            else new_bands
        )
        n, o = new_bands.alias("n"), index.alias("o")
        # BOTH directions: a new doc may be the smaller OR the larger
        # partner (out-of-order arrival) — normalize to id_a < id_b
        cand = (
            n.join(
                o,
                (F.col("n.band_idx") == F.col("o.band_idx"))
                & (F.col("n.band_hash") == F.col("o.band_hash"))
                & (F.col("o.doc_id") != F.col("n.doc_id")),
            )
            .select(
                F.least(F.col("o.doc_id"), F.col("n.doc_id")).alias("id_a"),
                F.greatest(F.col("o.doc_id"), F.col("n.doc_id")).alias(
                    "id_b"
                ),
            )
            .distinct()
        )
        all_sh = (
            read_snapshot(spark, sh_path).unionByName(feat)
            if table_exists(sh_path)
            else feat
        )
        verified = verify_pairs(
            cand, all_sh, "doc_id", "shingles", threshold=0.5
        ).select("id_a", "id_b")

        smaller_nbr = verified.groupBy("id_b").agg(
            F.min("id_a").alias("_mn")
        )
        dec = (
            feat.select("doc_id")
            .join(smaller_nbr, feat.doc_id == smaller_nbr.id_b, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("doc_id"), F.coalesce(F.col("_mn"), F.col("doc_id"))
                ).alias("canonical_id"),
            )
            .withColumn("is_kept", F.col("doc_id") == F.col("canonical_id"))
        )

        if not _applied(band_path, bi):
            write_snapshot(index, band_path, meta={"batch": bi})
        if not _applied(sh_path, bi):
            write_snapshot(all_sh, sh_path, meta={"batch": bi})
        if not _applied(dec_path, bi):
            prev = (
                read_snapshot(spark, dec_path)
                if table_exists(dec_path)
                else None
            )
            if prev is not None:
                # late canonical demotion: an already-admitted doc whose
                # smaller near-dup partner arrives NOW gets its verdict
                # revised — canonical accumulates LEAST(self, MIN(all
                # verified smaller neighbors)) across arrivals, so the
                # final table equals the batch star contraction under ANY
                # arrival order (ordered replay: no-op, demotions empty)
                prev = (
                    prev.join(
                        smaller_nbr, prev.doc_id == smaller_nbr.id_b, "left"
                    )
                    .select(
                        "doc_id",
                        F.least(
                            F.col("canonical_id"),
                            F.coalesce(F.col("_mn"), F.col("canonical_id")),
                        ).alias("canonical_id"),
                    )
                    .withColumn(
                        "is_kept", F.col("doc_id") == F.col("canonical_id")
                    )
                )
            out = prev.unionByName(dec) if prev is not None else dec
            write_snapshot(out, dec_path, meta={"batch": bi})

    q = (
        read_json_stream(
            spark, src,
            schema_ddl="doc_id LONG, text STRING",
            max_files_per_trigger=1,
        )
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName("dedup_ingest_gate")
        .start()
    )
    q.awaitTermination()
    return read_snapshot(spark, dec_path)


def run_streaming_semantic_gate(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_chunks: int = 4,
    threshold: float = 0.45,
    num_planes: int = 4,
    num_tables: int = 12,
    seed: int = 7,
    dim: int = 64,
    arrival_rank: list[int] | None = None,
) -> DataFrame:
    """Semantic (embedding-space) ingest gate — the SemDeDup analog of
    :func:`run_streaming_dedup_gate`: each micro-batch of vectors probes
    its hyperplane-LSH bucket signatures against the accumulated bucket
    index, exact-cosine-verifies candidates with the order-exact fold
    (bit-identical to the oracle's list_reduce), and decides keep/drop at
    arrival.  Parameters default to the batch ``semantic_dedup_pairs``
    operating point (L=12 tables x 4 seeded planes, exact-bucket) so the
    streaming candidate set equals the batch one, and vec-id-ordered
    arrival makes greedy first-wins equal the batch star contraction —
    ``streaming_semantic_ingest_gate`` hash-certifies the decision table
    against the SAME oracle as ``dedup_semantic_embedding``.

    Zero-norm vectors emit no buckets (as in batch) and canonicalize to
    themselves.  Per-batch work: signatures are map-only over the new
    vectors; the probe is a (table, bucket) equi-join of new signatures
    against the index; verification re-attaches only candidate vectors.
    """
    from bakery_big_data_spark.operators.similarity import (
        dot_exact,
        hyperplane_planes,
        hyperplane_signature,
        to_double_vec,
    )
    from bakery_big_data_spark.sources.snapshots import (
        append_commit,
        compact_log,
        last_commit_meta,
        read_log,
        table_exists,
    )
    from bakery_big_data_spark.sources.tables import load_table
    from bakery_big_data_spark.streaming.ingest import read_json_stream

    src = f"{base_path}/stream_src"
    ckpt = f"{base_path}/ckpt"
    bucket_path = f"{base_path}/bucket_state"
    vec_path = f"{base_path}/vec_state"
    dec_path = f"{base_path}/decisions"

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    write_ordered_json_chunks(emb, src, "vec_id", n_chunks, arrival_rank)

    tables = [
        hyperplane_planes(num_planes, dim, seed + 1000 * t)
        for t in range(num_tables)
    ]

    def _applied(path: str, bi: int) -> bool:
        meta = last_commit_meta(path)
        return meta is not None and meta.get("batch", -1) >= bi

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bi = int(batch_id)
        if all(_applied(p, bi) for p in (bucket_path, vec_path, dec_path)):
            return
        from pyspark.storagelevel import StorageLevel

        # serialized spill-friendly blocks: these per-batch frames are
        # CORPUS-PROPORTIONAL (vectors + L x signatures) and the default
        # deserialized localCheckpoint level accumulated across batches
        # is what drove the sf10-equivalent replay into the OOM killer
        # (r11 x100 sweep; same lesson as the triangle row's edge frame)
        vecs = batch_df.select(
            "vec_id",
            to_double_vec("embedding").alias("v"),
        )
        vecs = vecs.select(
            "vec_id", "v", dot_exact(F.col("v"), F.col("v")).alias("n2")
        ).localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK)
        sigs = vecs.filter(F.col("n2") > 0).select(
            "vec_id",
            F.posexplode(
                F.array(*[hyperplane_signature(F.col("v"), p) for p in tables])
            ).alias("t", "bucket"),
        ).localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK)

        # Append-log state (r11 verdict task 4): the accumulated index /
        # vector stores are read as base+Δ segment unions and each batch
        # COMMITS ONLY ITS Δ — per-batch write I/O is batch-sized, where
        # the r11 design rewrote the corpus-sized snapshot every
        # micro-batch (the dominant cost of the ×100 replay).  A batch
        # re-delivered after a partial commit may union its own rows
        # twice here; candidates/verified are .distinct() and scoring is
        # idempotent, so decision bits are unaffected (same property the
        # snapshot design had).
        index = (
            read_log(spark, bucket_path).unionByName(sigs)
            if table_exists(bucket_path)
            else sigs
        )
        all_vecs = (
            read_log(spark, vec_path).unionByName(vecs)
            if table_exists(vec_path)
            else vecs
        )
        # Candidate generation is the BATCH path's two-phase blocked
        # kernel (operators/similarity.py::semantic_dedup_pairs), not a
        # raw (t, bucket) equi-join: at stress scale a popular bucket
        # makes the equi-join materialize |new_bucket| x |bucket| rows in
        # one task (the r11 ×100 sweep OOM'd exactly there — 200 k
        # vectors over 2^4 buckets). Phase 1 groups each (table, bucket)
        # once and scores probe(new) × index(all) inside a numpy matmul
        # with a margined threshold, emitting only surviving pairs;
        # old×old pairs are never re-scored (probe side is the batch's
        # new vectors only — new×new still covered because the index side
        # includes them). Phase 2 below re-scores survivors with the
        # order-exact JVM fold, so decision bits still match the oracle.
        vrows = all_vecs.select(
            F.col("vec_id").alias("_vid"),
            F.col("v").cast("array<float>").alias("v"),
        )
        idx_rows = index.join(
            vrows, index.vec_id == vrows._vid
        ).select(
            index.vec_id.alias("vid"), "v", "t", "bucket",
            F.lit(1).alias("_side"),
        )
        new_rows = sigs.join(
            vrows, sigs.vec_id == vrows._vid
        ).select(
            sigs.vec_id.alias("vid"), "v", "t", "bucket",
            F.lit(0).alias("_side"),
        )
        # r11 ADVICE widened the margin 1e-6 → 1e-4; r12 widens to 1e-3
        # and ships/scores the pre-filter in FLOAT32 (half the Arrow
        # bytes through the bucket shuffle, ~2× SIMD matmul — the batch
        # operator's r12 change).  Worst-case unit-cosine f32 error is
        # ~1e-5, two orders under the margin; survivors are exactly
        # re-scored by the f64 JVM fold below, so decision bits are
        # unchanged.  tests/test_pipeline.py engineers a pair with exact
        # cosine == threshold and asserts it survives the pre-filter.
        margin = threshold - 1e-3

        def gate_bucket_fn(key, pdf):
            import numpy as np
            import pandas as pd

            empty = pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
            probe = pdf[pdf["_side"] == 0]
            idx = pdf[pdf["_side"] == 1]
            if len(probe) == 0 or len(idx) == 0:
                return empty
            ids_p = probe["vid"].to_numpy()
            mat_p = np.stack(probe["v"].to_numpy()).astype(np.float32)
            ids_i = idx["vid"].to_numpy()
            mat_i = np.stack(idx["v"].to_numpy()).astype(np.float32)
            np_ = np.sqrt((mat_p * mat_p).sum(axis=1))
            ni = np.sqrt((mat_i * mat_i).sum(axis=1))
            sims = (mat_p @ mat_i.T) / np.outer(np_, ni)
            ii, jj = np.nonzero(sims >= np.float32(margin))
            a_, b_ = ids_p[ii], ids_i[jj]
            keep = a_ != b_
            return pd.DataFrame(
                {
                    "id_a": np.minimum(a_, b_)[keep],
                    "id_b": np.maximum(a_, b_)[keep],
                }
            )

        cand = (
            idx_rows.unionByName(new_rows)
            .groupBy("t", "bucket")
            .applyInPandas(gate_bucket_fn, "id_a LONG, id_b LONG")
            .distinct()
        )
        a = all_vecs.select(
            F.col("vec_id").alias("id_a"),
            F.col("v").alias("_va"),
            F.col("n2").alias("_n2a"),
        )
        b = all_vecs.select(
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("_vb"),
            F.col("n2").alias("_n2b"),
        )
        verified = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .filter(
                dot_exact(F.col("_va"), F.col("_vb"))
                / F.sqrt(F.col("_n2a") * F.col("_n2b"))
                >= threshold
            )
            .select("id_a", "id_b")
            .distinct()
        )
        # MATERIALIZE before any state commit: `smaller` lazily reads the
        # bucket/vec append-logs, and the compact_log calls below delete
        # superseded segment dirs — with >max_segments micro-batches the
        # dec append would otherwise execute this plan against
        # just-deleted segment paths and fail with FileNotFound
        # (r12 ADVICE). Batch-sized (demotion records only), so the
        # checkpoint is cheap.
        smaller = (
            verified.groupBy("id_b")
            .agg(F.min("id_a").alias("_mn"))
            .localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK)
        )

        # Δ-sized commits: signatures and vectors append their batch;
        # decisions append the batch's DEMOTION RECORDS (id_b -> min
        # candidate) instead of rewriting the whole decision table.
        # Canonicalization is a least/min fold, so the final table —
        # canonical(v) = LEAST(v, MIN over all batches' records for v) —
        # is associative and arrival-order-independent: bit-identical to
        # the r11 sequential arrival-decision + late-demotion rewrite
        # (that design applied the same least() fold incrementally).
        if not _applied(bucket_path, bi):
            append_commit(sigs, bucket_path, meta={"batch": bi})
            compact_log(spark, bucket_path)
        if not _applied(vec_path, bi):
            append_commit(vecs, vec_path, meta={"batch": bi})
            compact_log(spark, vec_path)
        if not _applied(dec_path, bi):
            append_commit(
                smaller.select(
                    F.col("id_b").alias("vec_id"),
                    F.col("_mn").alias("cand_min"),
                ),
                dec_path,
                meta={"batch": bi},
            )
            compact_log(spark, dec_path)

    q = (
        read_json_stream(
            spark, src,
            schema_ddl="vec_id LONG, embedding ARRAY<FLOAT>",
            max_files_per_trigger=1,
        )
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName("semantic_ingest_gate")
        .start()
    )
    q.awaitTermination()
    # Fold the demotion log into the final decision table: every ingested
    # vector, canonicalized to the min over all logged demotions (or
    # itself).  Same output schema and bits as the r11 snapshot design.
    ids = read_log(spark, vec_path).select("vec_id")
    mins = (
        read_log(spark, dec_path)
        .groupBy("vec_id")
        .agg(F.min("cand_min").alias("_mn"))
    )
    return (
        ids.join(mins, "vec_id", "left")
        .select(
            "vec_id",
            F.least(
                F.col("vec_id"), F.coalesce(F.col("_mn"), F.col("vec_id"))
            ).alias("canonical_id"),
        )
        .withColumn("is_kept", F.col("vec_id") == F.col("canonical_id"))
    )
