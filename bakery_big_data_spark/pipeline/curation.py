"""Training-data curation pipeline assembly — the LLM-data counterpart of
:mod:`pipeline.medallion`.

The catalog proves each curation operator alone (dedup, decontamination,
splits, packing); a real pretraining run chains them in a fixed order over
one corpus scan lineage.  This module assembles that chain as pure
DataFrame builders and one committing runner:

1. **quality gate** — minimum length + lexical diversity (the cheap
   filters run FIRST so every later stage sees fewer rows);
2. **dedup canonicalization** — LSH-verified near-dup pairs → min-id star
   contraction; only cluster canonicals survive (non-canonicals carry
   their canonical_id in the manifest for lineage);
3. **decontamination** — word-trigram overlap vs the benchmark slice
   (doc_id % 25 == 0 here); benchmark docs themselves never become
   training docs;
4. **split assignment** — the key-derived LCG uniform (layout- and
   engine-independent; F.rand would reshuffle splits across re-runs).

The manifest keeps EVERY corpus doc with its flags — curation decisions
must be auditable, so drops are recorded, not silently vanished.  At
100 TB each stage is the operator already proven at the catalog level:
the expensive candidate generation (shingles) is computed once and shared
via the dedup family's bounded PlanCache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LCG_M = 2147483647
_SPLIT_A = 2654435761
_SPLIT_C = 97531

MIN_CHARS = 20
MIN_TTR = 0.30
CONTAMINATION_MAX = 0.5


def curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation manifest: every doc with its gate flags,
    duplicate-cluster canonical, contamination ratio, split, and the final
    ``is_training`` verdict."""
    from bakery_big_data_spark.operators.repetition import with_passes_gopher
    from bakery_big_data_spark.plans.base import spread, t
    from bakery_big_data_spark.plans.dedup import _lsh_pairs, _shingled

    d = spread(
        t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    )
    ws = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    # Gopher repetition/boilerplate gate (operators/repetition.py) — a
    # map-only projection riding the same scan as the cheap quality gate,
    # no extra stage (spread() gives the interpreted higher-order folds
    # full parallelism when the corpus arrives as one split)
    gated = with_passes_gopher(d, "text", "passes_repetition").select(
        "doc_id",
        "lang",
        "n_chars",
        ((F.col("n_chars") >= MIN_CHARS) & (ttr >= MIN_TTR)).alias(
            "passes_quality"
        ),
        "passes_repetition",
        (F.col("doc_id") % 25 == 0).alias("is_benchmark"),
    )

    # duplicate-cluster canonical via the shared LSH-verified pairs
    pairs = _lsh_pairs(spark, sf_dir)
    nbrs = pairs.select(
        F.col("id_a").alias("doc_id"), F.col("id_b").alias("nb")
    ).unionAll(pairs.select(F.col("id_b").alias("doc_id"), F.col("id_a").alias("nb")))
    canon = (
        gated.select("doc_id")
        .join(nbrs, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.least(
                F.col("doc_id"), F.coalesce(F.min("nb"), F.col("doc_id"))
            ).alias("canonical_id")
        )
    )

    # contamination vs the benchmark slice: corpus-side explode once,
    # broadcast the benchmark gram hashes (plans/curation.py shape)
    sh = _shingled(spark, sf_dir, cache=True)
    bench_grams = (
        sh.filter(F.col("doc_id") % 25 == 0)
        .select(F.explode("shingles").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_grams = (
        sh.filter(F.col("doc_id") % 25 != 0)
        .select("doc_id", F.explode_outer("shingles").alias("g"))
        .select(
            "doc_id",
            F.col("g").isNotNull().alias("is_gram"),
            F.when(F.col("g").isNotNull(), F.xxhash64("g")).alias("gh"),
        )
    )
    contamination = (
        corpus_grams.join(F.broadcast(bench_grams), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count_if("is_gram").alias("_n_grams"),
            F.count("hit").alias("_n_shared"),
        )
        .select(
            "doc_id",
            F.when(F.col("_n_grams") == 0, F.lit(0.0))
            .otherwise(F.col("_n_shared").cast("double") / F.col("_n_grams"))
            .alias("contamination_ratio"),
        )
    )

    u = (
        (F.col("doc_id").cast("bigint") * _SPLIT_A + F.lit(_SPLIT_C)) % _LCG_M
    ) / F.lit(float(_LCG_M))
    manifest = (
        gated.join(canon, "doc_id")
        .join(contamination, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "passes_quality",
            "passes_repetition",
            "is_benchmark",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
            F.coalesce(F.col("contamination_ratio"), F.lit(0.0)).alias(
                "contamination_ratio"
            ),
            F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias(
                "split"
            ),
        )
    )
    return manifest.withColumn(
        "is_training",
        F.col("passes_quality")
        & F.col("passes_repetition")
        & ~F.col("is_benchmark")
        & F.col("is_canonical")
        & (F.col("contamination_ratio") < CONTAMINATION_MAX),
    )


def run_curation_pipeline(
    spark: SparkSession, sf_dir: str, base_path: str
) -> dict[str, DataFrame]:
    """Commit the manifest + the split-partitioned training corpus; returns
    the layers re-read from disk (the committed truth, not the plan)."""
    manifest = curation_manifest(spark, sf_dir)
    manifest.write.mode("overwrite").parquet(f"{base_path}/curation_manifest")

    from bakery_big_data_spark.plans.base import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    committed = spark.read.parquet(f"{base_path}/curation_manifest")
    training = (
        committed.filter(F.col("is_training"))
        .select("doc_id", "split", "n_chars")
        .join(docs, "doc_id")
    )
    training.write.mode("overwrite").partitionBy("split").parquet(
        f"{base_path}/training_corpus"
    )

    # final stage: pack the TRAIN split into ~fixed-token batches (the
    # sharded running-offset layout of curation_pack_sequences, applied to
    # the committed corpus instead of the raw one — packs never straddle
    # splits, and shard count scales with the cluster)
    from pyspark.sql import Window

    corpus = spark.read.parquet(f"{base_path}/training_corpus")
    toks = corpus.filter(F.col("split") == "train").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        # integer `div` — float `/`+cast mis-buckets past 2^53 offsets
        F.expr(
            "coalesce(sum(n_tokens) over (partition by shard order by doc_id"
            " rows between unbounded preceding and 1 preceding), 0) div 2048"
        ).cast("bigint").alias("pack_id"),
    )
    packed.write.mode("overwrite").parquet(f"{base_path}/packed_train")
    return {
        "curation_manifest": spark.read.parquet(f"{base_path}/curation_manifest"),
        "training_corpus": spark.read.parquet(f"{base_path}/training_corpus"),
        "packed_train": spark.read.parquet(f"{base_path}/packed_train"),
    }
