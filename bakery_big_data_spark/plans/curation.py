"""Dataset-curation queries over ``documents.parquet`` — the training-data
assembly family (deterministic splits, benchmark decontamination, quality
filter funnels).

These are the operations a large-scale pretraining pipeline runs after
dedup/similarity and before tokenization (reference has no analogue; scope
extension per the LLM-data-pipeline brief, same pattern as plans/dedup.py /
plans/textops.py):

- ``curation_hash_split``: train/val/test assignment that is a pure function
  of the business key — identical under any partition layout, cluster size,
  or engine.  ``F.rand(seed)`` is only fixed per layout, and at 100 TB a
  re-run with different input splits silently reshuffles examples across
  splits (train/test leakage); key-derived uniforms cannot.
- ``curation_contamination_check``: word-trigram overlap between the corpus
  and a benchmark set.  The benchmark gram set is tiny relative to the
  corpus, so the plan is corpus-side map (explode grams) → broadcast-hash
  semi-join against benchmark grams → per-doc count; the corpus is streamed
  exactly once and never shuffled on content.
- ``curation_filter_funnel``: per-stage survivor accounting for a chained
  quality filter (length → lexical diversity → language) — one conditional
  aggregation, map-side combinable, the standard "retention report" every
  curation run publishes.

All three are built-in-expression only (no UDFs) and DuckDB-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bakery_big_data_spark.plans.base import register, t

_LCG_M = 2147483647  # 2^31 - 1; mixes stay far below 2^63 (ANSI-safe)
_SPLIT_A = 2654435761  # Knuth multiplicative-hash constant
_SPLIT_C = 97531


@register(
    "curation_hash_split",
    f"""
    SELECT doc_id,
           ((doc_id * {_SPLIT_A} + {_SPLIT_C}) % {_LCG_M}) / {float(_LCG_M)} AS u,
           CASE
             WHEN ((doc_id * {_SPLIT_A} + {_SPLIT_C}) % {_LCG_M}) / {float(_LCG_M)} < 0.8
               THEN 'train'
             WHEN ((doc_id * {_SPLIT_A} + {_SPLIT_C}) % {_LCG_M}) / {float(_LCG_M)} < 0.9
               THEN 'val'
             ELSE 'test'
           END AS split,
           n_chars
    FROM documents
    """,
    doc="Deterministic train/val/test split: u = ((doc_id*a + c) mod (2^31-1)) "
        "/ (2^31-1), thresholds 0.8/0.9.  Key-derived, so the assignment is "
        "identical under any partition layout or cluster size (F.rand(seed) "
        "is not) — re-runs at 100 TB can never leak examples across splits.  "
        "Map-only, no shuffle",
)
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id").cast("bigint") * _SPLIT_A + F.lit(_SPLIT_C)) % _LCG_M
    ) / F.lit(float(_LCG_M))
    return d.select(
        "doc_id",
        u.alias("u"),
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
        "n_chars",
    )


@register(
    "curation_contamination_check",
    """
    WITH grams AS (
      SELECT doc_id,
             list_distinct(
               list_transform(generate_series(1, len(ws) - 2),
                              i -> ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2])) AS gs
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 25 = 0
    ), corpus AS (
      SELECT doc_id, gs, len(gs) AS n_grams FROM grams WHERE doc_id % 25 <> 0
    ), shared AS (
      SELECT c.doc_id, COUNT(*) AS n_shared
      FROM (SELECT doc_id, unnest(gs) AS g FROM corpus) c
      JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id
    )
    SELECT corpus.doc_id,
           n_grams,
           COALESCE(n_shared, 0) AS n_shared,
           CASE WHEN n_grams = 0 THEN 0.0
                ELSE CAST(COALESCE(n_shared, 0) AS DOUBLE) / n_grams
           END AS contamination_ratio
    FROM corpus LEFT JOIN shared ON corpus.doc_id = shared.doc_id
    """,
    doc="Benchmark decontamination: for every corpus doc, the fraction of its "
        "distinct word trigrams that appear in any benchmark doc (benchmark = "
        "doc_id % 25 = 0 here; in production the held-out eval suites).  "
        "Single-pass plan: the corpus is shingled and exploded ONCE, grams "
        "are xxhash64'd to longs (string equality never reaches the join), "
        "then a broadcast-hash LEFT join marks benchmark hits and one "
        "map-side-combinable groupBy yields n_grams and n_shared together — "
        "no second corpus scan, no doc-level re-join.  At 100 TB the distinct "
        "benchmark gram hashes (MBs) broadcast to every executor and the only "
        "shuffle is 1 row/doc/partition of partial counts.  (A two-pass "
        "string-join formulation measured 11.8 s at sf0.1; this plan 2.4 s.)",
)
def curation_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.plans.dedup import _shingled

    # Same trigram shingles as the dedup family -> share its persisted frame
    # (one shingling pass serves dedup + decontamination in a real run).
    d = _shingled(spark, sf_dir, cache=True).withColumnRenamed("shingles", "gs")
    bench = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(F.explode("gs").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # explode_outer keeps zero-gram docs (g NULL -> gh NULL -> never joins).
    corpus = (
        d.filter(F.col("doc_id") % 25 != 0)
        .select("doc_id", F.explode_outer("gs").alias("g"))
        .select(
            "doc_id",
            F.col("g").isNotNull().alias("is_gram"),
            F.when(F.col("g").isNotNull(), F.xxhash64("g")).alias("gh"),
        )
    )
    counted = (
        corpus.join(F.broadcast(bench), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count_if("is_gram").alias("n_grams"),
            F.count("hit").alias("n_shared"),
        )
    )
    return counted.select(
        "doc_id",
        "n_grams",
        "n_shared",
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(F.col("n_shared").cast("double") / F.col("n_grams"))
        .alias("contamination_ratio"),
    )


@register(
    "curation_filter_funnel",
    """
    SELECT COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE n_chars >= 150) AS n_len,
           COUNT(*) FILTER (WHERE n_chars >= 150 AND ttr >= 0.4) AS n_len_ttr,
           COUNT(*) FILTER (WHERE n_chars >= 150 AND ttr >= 0.4 AND lang = 'en')
             AS n_len_ttr_lang,
           CAST(COUNT(*) FILTER (WHERE n_chars >= 150 AND ttr >= 0.4
                                   AND lang = 'en') AS DOUBLE) / COUNT(*)
             AS retention
    FROM (
      SELECT n_chars, lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents
    )
    """,
    doc="Quality-filter funnel with per-stage survivor accounting: length "
        "(n_chars >= 150) -> lexical diversity (type-token ratio >= 0.4) -> "
        "language (en), reported as one row of stage counts + final retention. "
        "Single conditional aggregation over one scan — map-side combinable, "
        "no intermediate materialization per stage",
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    staged = d.select(
        (F.col("n_chars") >= 150).alias("p_len"),
        ((F.col("n_chars") >= 150) & (ttr >= 0.4)).alias("p_ttr"),
        ((F.col("n_chars") >= 150) & (ttr >= 0.4) & (F.col("lang") == "en")).alias(
            "p_all"
        ),
    )
    cnt = lambda p: F.count_if(F.col(p))  # noqa: E731
    return staged.agg(
        F.count("*").alias("n_total"),
        cnt("p_len").alias("n_len"),
        cnt("p_ttr").alias("n_len_ttr"),
        cnt("p_all").alias("n_len_ttr_lang"),
        (cnt("p_all").cast("double") / F.count("*")).alias("retention"),
    )


#: Independent LCG constants for sampling (distinct from the split constants
#: so sample membership is uncorrelated with split assignment).
_SAMP_A = 1103515245
_SAMP_C = 12345

#: Stratified sampling rates per language stratum.
_RATES = {"en": 0.5, "de": 0.3, "fr": 0.2}
_RATE_OTHER = 0.1


@register(
    "curation_stratified_sample",
    f"""
    SELECT doc_id, lang, u, rate
    FROM (
      SELECT doc_id, lang,
             ((doc_id * {_SAMP_A} + {_SAMP_C}) % {_LCG_M}) / {float(_LCG_M)} AS u,
             CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3
                       WHEN 'fr' THEN 0.2 ELSE 0.1 END AS rate
      FROM documents
    )
    WHERE u < rate
    """,
    doc="Deterministic stratified sampling: per-language acceptance rates "
        "(the domain-mixture reweighting step of a pretraining data recipe) "
        "with key-derived uniforms — like curation_hash_split, membership is "
        "a pure function of doc_id, so any re-run, engine, or partition "
        "layout draws the identical sample (df.sampleBy cannot promise "
        "that).  Map-only filter, no shuffle, fully pushdown-friendly",
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id").cast("bigint") * _SAMP_A + F.lit(_SAMP_C)) % _LCG_M
    ) / F.lit(float(_LCG_M))
    rate = F.when(F.col("lang") == "en", 0.5).when(F.col("lang") == "de", 0.3).when(
        F.col("lang") == "fr", 0.2
    ).otherwise(0.1)
    return (
        d.select("doc_id", "lang", u.alias("u"), rate.alias("rate"))
        .filter(F.col("u") < F.col("rate"))
    )


_CHUNK = 32  # tokens per training chunk


@register(
    "curation_chunk_documents",
    f"""
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           len(list_slice(ws, ci * {_CHUNK} + 1, (ci + 1) * {_CHUNK}))
             AS n_chunk_tokens,
           array_to_string(
             list_slice(ws, ci * {_CHUNK} + 1, (ci + 1) * {_CHUNK}), ' ')
             AS chunk_text
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL unnest(
           generate_series(0, CAST(ceil(len(ws) / {float(_CHUNK)}) AS BIGINT) - 1)
         ) AS l(ci)
    """,
    doc=f"Token-budget document chunking: each doc's whitespace tokens are "
        f"cut into {_CHUNK}-token training chunks (final partial chunk "
        f"kept), emitted as (doc_id, chunk_idx, n_tokens, text) — the "
        f"tokenize-and-chunk step before example packing.  Tokenized once, "
        f"chunk index exploded from a sequence, slices taken JVM-side; "
        f"map-only with output ~linear in corpus size, no shuffle",
)
def curation_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size("ws") / float(_CHUNK)).cast("bigint")
    return (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            "ws",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("ci"),
        )
        .select(
            "doc_id",
            F.col("ci").cast("int").alias("chunk_idx"),
            F.size(F.slice("ws", F.col("ci").cast("int") * _CHUNK + 1, F.lit(_CHUNK))).alias(
                "n_chunk_tokens"
            ),
            F.array_join(
                F.slice("ws", F.col("ci").cast("int") * _CHUNK + 1, F.lit(_CHUNK)), " "
            ).alias("chunk_text"),
        )
    )


_PACK_BUDGET = 512  # context-window token budget per packed example
_PACK_SHARDS = 8


@register(
    "curation_pack_sequences",
    f"""
    WITH toks AS (
      SELECT doc_id,
             doc_id % {_PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), placed AS (
      SELECT shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_PACK_BUDGET} AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT shard, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_BUDGET} AS fill_ratio
    FROM placed
    GROUP BY shard, pack_id
    """,
    doc=f"Sequence packing: docs are packed in key order into "
        f"{_PACK_BUDGET}-token context windows (sequential greedy — each doc "
        f"joins the pack at its exclusive running-token offset, so a pack "
        f"overflows only by its final straddling doc), reported per pack as "
        f"doc count / token count / fill ratio.  Packing runs independently "
        f"inside {_PACK_SHARDS} hash shards — the window never sees a global "
        f"order, so at 100 TB each shard packs in parallel after one "
        f"hash-partition shuffle (shard count scales with the cluster; "
        f"cross-shard order is irrelevant to training)",
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.select(
        "shard",
        "n_tokens",
        # integer `div`: float `/`+cast silently mis-buckets once the
        # cumulative token offset passes 2^53 (same rationale as the PPS
        # stripes)
        F.expr(
            f"coalesce(sum(n_tokens) over (partition by shard order by doc_id"
            f" rows between unbounded preceding and 1 preceding), 0)"
            f" div {_PACK_BUDGET}"
        ).cast("bigint").alias("pack_id"),
    )
    return placed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_tokens").cast("double") / _PACK_BUDGET).alias("fill_ratio"),
    )


_HIST_WIDTH = 20
_HIST_BUCKETS = 10


@register(
    "curation_length_histogram",
    f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(len(string_split(text, ' ')) / {_HIST_WIDTH})
                        AS BIGINT),
                   {_HIST_BUCKETS - 1}) AS bucket
      FROM documents
    )
    SELECT bucket,
           CAST(bucket * {_HIST_WIDTH} AS BIGINT) AS lo_tokens,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS share
    FROM b GROUP BY bucket
    """,
    doc=f"Context-length binning: corpus token-count histogram "
        f"({_HIST_BUCKETS} buckets of {_HIST_WIDTH} tokens, top bucket "
        f"open) with per-bucket share — the length-distribution report that "
        f"drives curriculum/packing decisions.  One map-side-combinable "
        f"aggregation; the total-count divisor folds into a broadcast "
        f"scalar, so the plan is one scan + one tiny shuffle",
)
def curation_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    bucket = F.least(
        (n / _HIST_WIDTH).cast("bigint"), F.lit(_HIST_BUCKETS - 1).cast("bigint")
    )
    counts = d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # Lazy scalar total: 1-row aggregate broadcast onto every bucket row —
    # no eager .count() on the driver.
    total = d.agg(F.count(F.lit(1)).alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        (F.col("bucket") * _HIST_WIDTH).cast("bigint").alias("lo_tokens"),
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("_total")).alias("share"),
    )


@register(
    "text_scrub_patterns",
    """
    WITH contaminated AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com ref ' || (doc_id * 7919) AS raw
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]'))
             AS n_emails,
           len(regexp_extract_all(raw, '[0-9]+')) AS n_digit_runs,
           regexp_replace(
             regexp_replace(raw, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]',
                            '<EMAIL>', 'g'),
             '[0-9]+', '<NUM>', 'g') AS scrubbed
    FROM contaminated
    """,
    doc="PII-pattern scrubbing (the text-cleaning pass an LLM corpus runs "
        "before training): per-doc email and digit-run detection counts + "
        "masked output.  The contaminated column is synthesized "
        "deterministically from doc_id so the masking paths see real "
        "matches; the regex subset (char classes, +) behaves identically "
        "in Java regex (Spark) and RE2 (DuckDB).  Map-only projection — "
        "regexes run JVM-side, no shuffle, streams at any corpus size",
)
def text_scrub_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    email_re = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    c = d.select("doc_id", raw.alias("raw"))
    return c.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(raw, '{email_re}', 0)")).alias("n_emails"),
        F.size(F.expr("regexp_extract_all(raw, '[0-9]+', 0)")).alias("n_digit_runs"),
        F.regexp_replace(
            F.regexp_replace("raw", email_re, "<EMAIL>"), "[0-9]+", "<NUM>"
        ).alias("scrubbed"),
    )


#: Third independent LCG stream (upsampling's fractional-copy coin flips
#: must be uncorrelated with both split assignment and sampling).
_MIX_A = 22695477
_MIX_C = 1


@register(
    "curation_mixture_upsample",
    f"""
    WITH weighted AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 2.5
                       WHEN 'fr' THEN 3.0 ELSE 0.5 END AS w,
             ((doc_id * {_MIX_A} + {_MIX_C}) % {_LCG_M}) / {float(_LCG_M)} AS u
      FROM documents
    ), counted AS (
      SELECT doc_id, lang, w,
             CAST(FLOOR(w) AS BIGINT)
               + CASE WHEN u < w - FLOOR(w) THEN 1 ELSE 0 END AS n_copies
      FROM weighted
    )
    SELECT doc_id, lang, CAST(ci AS INT) AS copy_idx
    FROM counted, LATERAL unnest(generate_series(1, n_copies)) AS l(ci)
    WHERE n_copies > 0
    """,
    doc="Domain-mixture upsampling (the data-mixing step of a pretraining "
        "recipe): per-language target weights become integer replication "
        "plus a key-derived coin flip for the fractional part — de x2.5 "
        "means every de doc twice and half of them (chosen by hash, not "
        "rand) a third time; weights < 1 downsample.  Expected output "
        "ratios equal the weights exactly in distribution, assignment is "
        "layout-independent, and the explode is map-only (no shuffle) with "
        "output linear in the weighted corpus size",
)
def curation_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    w = (
        F.when(F.col("lang") == "en", 1.0)
        .when(F.col("lang") == "de", 2.5)
        .when(F.col("lang") == "fr", 3.0)
        .otherwise(0.5)
    )
    u = (
        (F.col("doc_id").cast("bigint") * _MIX_A + F.lit(_MIX_C)) % _LCG_M
    ) / F.lit(float(_LCG_M))
    counted = d.select(
        "doc_id",
        "lang",
        (
            F.floor(w).cast("bigint")
            + F.when(u < (w - F.floor(w)), 1).otherwise(0)
        ).alias("n_copies"),
    )
    return (
        counted.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias(
                "ci"
            ),
        )
        .select("doc_id", "lang", F.col("ci").cast("int").alias("copy_idx"))
    )


_PPS_K = 10  # samples per stratum


@register(
    "curation_pps_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             (doc_id * 1103515245 + 12345) % {_LCG_M} AS shuffle_key
      FROM documents
    ), cum AS (
      SELECT doc_id, lang, n_chars, shuffle_key,
             CAST(SUM(n_chars) OVER (PARTITION BY lang
                                     ORDER BY shuffle_key, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(SUM(n_chars) OVER (PARTITION BY lang) AS BIGINT) AS total_w
      FROM keyed
    )
    SELECT doc_id, lang, n_chars,
           CAST((cw * {_PPS_K}) // total_w AS BIGINT) AS stripe
    FROM cum
    WHERE (cw * {_PPS_K}) // total_w > ((cw - n_chars) * {_PPS_K}) // total_w
    """,
    doc="Probability-proportional-to-size systematic sampling per stratum "
        "(mixture assembly by TOKEN budget, not doc count: a 10k-char doc "
        "is 10k training tokens, so sampling docs uniformly under-weights "
        "long documents).  Docs are shuffled by a key-derived LCG, then "
        f"{_PPS_K} equal-weight stripes per lang select the doc whose "
        "cumulative char-weight crosses each stripe boundary — selection "
        "probability is proportional to n_chars.  ALL-INTEGER arithmetic "
        "(cumsum, multiply, floor-divide in BIGINT): bit-exact on any "
        "engine and any partition layout, unlike float-priority weighted "
        "reservoirs whose ln()/pow() ulp differences can flip boundary "
        "picks.  One window shuffle per stratum",
)
def curation_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.keys import add_prefix_sum

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    keyed = d.withColumn(
        "shuffle_key",
        (F.col("doc_id").cast("bigint") * 1103515245 + 12345) % _LCG_M,
    )
    # SCALABLE cumulative weight: a plain SUM OVER (PARTITION BY lang ...)
    # would funnel each of ~5 strata through one task at 100 TB; the
    # range-partitioned prefix sum keeps every heavy step parallel
    # (operators/keys.py::add_prefix_sum).  Totals come from a tiny
    # per-lang aggregate broadcast back — not a whole-partition window.
    cum = add_prefix_sum(
        keyed,
        partition_by="lang",
        order_by=["shuffle_key", "doc_id"],
        value_col="n_chars",
        out_col="cw",
    )
    totals = keyed.groupBy("lang").agg(
        F.sum("n_chars").cast("bigint").alias("total_w")
    )
    cum = cum.join(F.broadcast(totals), "lang")
    # `div` is exact BIGINT division (float `/` + floor would silently
    # mis-round once cw*K passes 2^53 — real at 100 TB char budgets).
    stripe = F.expr(f"(cw * {_PPS_K}) div total_w").cast("bigint")
    prev_stripe = F.expr(f"((cw - n_chars) * {_PPS_K}) div total_w").cast(
        "bigint"
    )
    return cum.filter(stripe > prev_stripe).select(
        "doc_id", "lang", "n_chars", stripe.alias("stripe")
    )


@register(
    "curation_dsir_resample",
    """
    WITH tok AS (
      SELECT doc_id, source, w
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''
    ), bucketed AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(w), 1, 8))::BIGINT & 2147483647) % 64
               AS bucket
      FROM tok
    ), ratio AS (
      SELECT bucket,
             ((SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1)
               * 1000000) // (COUNT(*) + 1) AS rq
      FROM bucketed GROUP BY bucket
    ), scored AS (
      SELECT b.doc_id,
             CAST(SUM(rt.rq) AS BIGINT) AS dsir_score_q,
             COUNT(*) AS n_tokens
      FROM bucketed b JOIN ratio rt USING (bucket)
      WHERE b.source <> 'src0'
      GROUP BY b.doc_id
    )
    SELECT doc_id, dsir_score_q, n_tokens
    FROM scored
    ORDER BY dsir_score_q DESC, doc_id
    LIMIT 100
    """,
    doc="DSIR-style importance resampling (Xie et al., NeurIPS 2023): "
        "select raw-pool documents whose hashed-unigram distribution "
        "best matches a curated target domain (here source='src0' plays "
        "Wikipedia).  Tokens hash into 64 buckets via the catalog's "
        "portable md5-half; per-bucket importance ratio = add-one-"
        "smoothed (target+1)/(corpus+1), quantized ALL-INTEGER at 1e6 "
        "(exact BIGINT floor-div — no ln()/double whose libm ulps could "
        "flip the top-k boundary cross-engine; overflow needs a single "
        "TARGET bucket over ~9e12 tokens, i.e. a ~6e14-token curated "
        "corpus).  Per-doc score = BIGINT sum of its tokens' bucket "
        "ratios (order-free), then deterministic top-100 by (score, "
        "doc_id).  Scale plan: map-only token hash, two B-bounded "
        "aggregates, a 64-row ratio table BROADCAST back onto the token "
        "stream, one (doc_id) hash agg, TakeOrderedAndProject top-k — "
        "the corpus is never shuffled on content and the only wide state "
        "is docs x 1 score rows",
)
def curation_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(2147483647))
        % 64
    )
    bucketed = toks.select("doc_id", "source", bucket.alias("bucket"))
    # raw + target counts in ONE conditional aggregate over the token
    # stream (two corpus scans total: model pass + scoring pass)
    ratio = (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.when(F.col("source") == "src0", 1).otherwise(0)
            ).alias("tc"),
        )
        .select(
            "bucket",
            F.expr("((tc + 1L) * 1000000L) div (c + 1L)")
            .cast("bigint")
            .alias("rq"),
        )
    )
    scored = (
        bucketed.filter(F.col("source") != "src0")
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("rq").cast("bigint").alias("dsir_score_q"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return scored.orderBy(
        F.col("dsir_score_q").desc(), F.col("doc_id")
    ).limit(100)


@register(
    "text_quality_classifier_infer",
    """
    WITH split AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), toks AS (
      -- pos renumbered AFTER dropping empty tokens, so bigram adjacency
      -- is over the filtered token sequence (texts with consecutive
      -- interior spaces still pair across the gap, matching Spark's
      -- filter-then-zip construction)
      SELECT doc_id, ws[g.i] AS tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY g.i) AS pos
      FROM split, UNNEST(generate_series(1, len(ws))) AS g(i)
      WHERE ws[g.i] <> ''
    ), uni AS (
      SELECT doc_id,
             COUNT(*) AS n_uni,
             SUM((('0x' || substr(md5('u:' || tok), 1, 8))::BIGINT
                  & 2147483647) % 2001 - 1000) AS w_uni
      FROM toks GROUP BY doc_id
    ), bi AS (
      SELECT a.doc_id,
             COUNT(*) AS n_bi,
             SUM((('0x' || substr(md5('b:' || a.tok || ' ' || b.tok), 1, 8))
                    ::BIGINT & 2147483647) % 2001 - 1000) AS w_bi
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY a.doc_id
    )
    SELECT u.doc_id,
           CAST(u.n_uni AS BIGINT) AS n_tokens,
           CAST(COALESCE(b.n_bi, 0) AS BIGINT) AS n_bigrams,
           CAST(u.w_uni + COALESCE(b.w_bi, 0) + 37 AS DOUBLE)
             / (1000.0 * (u.n_uni + COALESCE(b.n_bi, 0) + 1)) AS logit,
           CAST(u.w_uni + COALESCE(b.w_bi, 0) + 37 AS DOUBLE)
             / (1000.0 * (u.n_uni + COALESCE(b.n_bi, 0) + 1)) >= 0.0
             AS is_high_quality
    FROM uni u LEFT JOIN bi b ON b.doc_id = u.doc_id
    """,
    doc="fastText-style hashed-bigram linear quality classifier INFERENCE "
        "(Joulin et al. 2017 shape: mean of hashed unigram+bigram feature "
        "weights -> linear layer -> sign), the standard pretraining "
        "quality-filter pass (e.g. CCNet/GPT-3 Wikipedia-vs-CommonCrawl "
        "filters).  Weights are a seeded stand-in derived from the "
        "catalog's portable md5-half hash (production would load trained "
        "weights keyed by the same buckets; the certified artifact is "
        "the INFERENCE KERNEL: vocabulary-unbounded hashing, bigram "
        "adjacency, mean-pool, threshold gate).  Numerics: per-feature "
        "weights are INTEGERS (hash %% 2001 - 1000), summed exactly as "
        "BIGINT, with ONE double division at the end — order-independent "
        "and bit-identical cross-engine; the sigmoid is monotone so the "
        "quality gate thresholds the logit directly.  Plan: map-only "
        "token/bigram expansion, ONE hash agg keyed doc_id (partial "
        "map-side combine), no dictionary, no UDF — at 100 TB this is a "
        "single corpus pass, the same scaling class as "
        "text_feature_hashing",
)
def text_quality_classifier_infer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("_ws")
    )
    # unigram / bigram feature streams share one split; empty tokens are
    # dropped BEFORE adjacency, so bigrams pair across runs of spaces —
    # the oracle renumbers positions after its empty filter to match
    clean = docs.select(
        "doc_id", F.filter(F.col("_ws"), lambda w: w != "").alias("ws")
    )

    def half_weight(expr: F.Column) -> F.Column:
        # integer weight in [-1000, 1000]: md5-half hash % 2001 - 1000
        return (
            F.conv(F.substring(F.md5(expr), 1, 8), 16, 10)
            .cast("bigint")
            .bitwiseAND(F.lit(2147483647))
            % 2001
            - 1000
        )

    uni = (
        clean.select("doc_id", F.explode("ws").alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(half_weight(F.concat(F.lit("u:"), F.col("tok"))))
            .alias("_wu"),
        )
    )
    bi = (
        clean.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bg"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum(half_weight(F.concat(F.lit("b:"), F.col("bg"))))
            .alias("_wb"),
        )
    )
    j = uni.join(bi, "doc_id", "left")
    n_bi = F.coalesce(F.col("_nb"), F.lit(0)).cast("bigint")
    logit = (
        (F.col("_wu") + F.coalesce(F.col("_wb"), F.lit(0)) + 37)
        .cast("double")
        / (F.lit(1000.0) * (F.col("n_tokens") + n_bi + 1))
    )
    return j.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        n_bi.alias("n_bigrams"),
        logit.alias("logit"),
        (logit >= 0.0).alias("is_high_quality"),
    )


# Shared URL-synthesis + canonicalization CTE chain (used by the
# canonical-dedup row and the per-domain quota row below): h -> raw
# (seeded synthesized URL) -> parts/comp (mirrored-regex parse) -> canon
# (lowercased, de-www'd, default-port-stripped, utm-filtered,
# param-sorted components).
_URL_CANON_CTES = """
    h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('url:' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT & 2147483647 AS hh
      FROM documents
    ), raw AS (
      SELECT doc_id,
             (CASE WHEN hh % 2 = 0 THEN 'http' ELSE 'HTTPS' END)
             || '://'
             || (CASE WHEN (hh // 2) % 2 = 0 THEN 'WWW.' ELSE '' END)
             || source || '.Example.'
             || (CASE WHEN (hh // 4) % 2 = 0 THEN 'COM' ELSE 'org' END)
             || (CASE (hh // 8) % 3
                   WHEN 0 THEN ''
                   WHEN 1 THEN (CASE WHEN hh % 2 = 0 THEN ':80' ELSE ':443' END)
                   ELSE ':8080' END)
             || '/p/' || CAST(doc_id % 7 AS VARCHAR)
             || (CASE WHEN (hh // 24) % 2 = 0 THEN '/' ELSE '' END)
             || '?'
             || (CASE WHEN (hh // 48) % 2 = 0
                   THEN 'id=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_source=feed'
                   ELSE 'utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR) END)
             || (CASE WHEN (hh // 96) % 2 = 0 THEN '&ref=x' ELSE '' END)
             || (CASE WHEN (hh // 192) % 2 = 0 THEN '#top' ELSE '' END)
               AS url
      FROM h
    ), parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(regexp_replace(url, '^[A-Za-z]+://', ''),
                            '#.*$', '') AS rest
      FROM raw
    ), comp AS (
      SELECT doc_id, url, scheme,
             lower(regexp_replace(regexp_extract(rest, '^([^/?]+)', 1),
                                  ':[0-9]+$', '')) AS host,
             regexp_extract(regexp_extract(rest, '^([^/?]+)', 1),
                            ':([0-9]+)$', 1) AS port,
             regexp_replace(regexp_replace(rest, '^[^/?]+', ''),
                            '\\?.*$', '') AS path,
             regexp_extract(rest, '\\?(.*)$', 1) AS query
      FROM parts
    ), canon AS (
      SELECT doc_id, url, scheme,
             regexp_replace(host, '^www\\.', '') AS host_c,
             CASE WHEN port <> ''
                   AND NOT ((scheme = 'http' AND port = '80')
                            OR (scheme = 'https' AND port = '443'))
                  THEN ':' || port ELSE '' END AS port_c,
             CASE WHEN path IN ('', '/') THEN '/'
                  ELSE regexp_replace(path, '/$', '') END AS path_c,
             array_to_string(list_sort(list_filter(
               string_split(query, '&'),
               p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS query_c
      FROM comp
    )"""


@register(
    "curation_url_canonical_dedup",
    f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, url,
           scheme || '://' || host_c || port_c || path_c
             || (CASE WHEN query_c <> '' THEN '?' || query_c ELSE '' END)
             AS canonical_url,
           regexp_extract(host_c, '([^.]+\\.[^.]+)$', 1)
             AS registrable_domain,
           doc_id = MIN(doc_id) OVER (
             PARTITION BY scheme || '://' || host_c || port_c || path_c
               || (CASE WHEN query_c <> '' THEN '?' || query_c ELSE '' END)
           ) AS is_canonical_rep
    FROM canon
    """,
    doc="URL/host canonicalization + domain-level dedup keys — the "
        "crawl-curation pass that precedes content dedup (one fetch per "
        "canonical URL; per-registrable-domain quotas).  documents.parquet "
        "carries no URL column, so a deterministic seeded URL is "
        "synthesized per doc (md5-half bits drive scheme/host case, "
        "optional www, default vs explicit ports, trailing slash, query "
        "param order, utm_* noise, fragments — the join_cross_synthesize "
        "precedent); the CERTIFIED artifact is the canonicalizer itself, "
        "which parses the URL string with mirrored regexes: lowercase "
        "scheme+host, strip www/fragment/default ports (keep :8080), "
        "collapse trailing slash, drop utm_* params and SORT the rest, "
        "extract the naive registrable domain (last two labels; a "
        "public-suffix list would slot in as a broadcast dim at "
        "production).  is_canonical_rep = min-doc_id-wins over the "
        "canonical key.  Plan: map-only string surgery (zero UDF) + ONE "
        "window over the canonical key — at 100 TB the window shuffle is "
        "the only exchange and keys are short strings",
)
def curation_url_canonical_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    canon = _synth_canon_urls(spark, sf_dir)
    canonical_url = F.concat(
        F.col("scheme"), F.lit("://"), F.col("host_c"), F.col("port_c"),
        F.col("path_c"),
        F.when(
            F.col("query_c") != "", F.concat(F.lit("?"), F.col("query_c"))
        ).otherwise(F.lit("")),
    )
    w = Window.partitionBy(canonical_url)
    return canon.select(
        "doc_id", "url",
        canonical_url.alias("canonical_url"),
        F.regexp_extract("host_c", r"([^.]+\.[^.]+)$", 1).alias(
            "registrable_domain"
        ),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias(
            "is_canonical_rep"
        ),
    )


def _synth_canon_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded synthesized URL per doc + mirrored-regex canonical
    components (doc_id, url, scheme, host_c, port_c, path_c, query_c) —
    the Spark twin of the _URL_CANON_CTES oracle chain, shared by the
    canonical-dedup and per-domain quota rows."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    hh = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("url:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        )
        .cast("bigint")
        .bitwiseAND(F.lit(2147483647))
    )
    is_http = hh % 2 == 0
    url = F.concat(
        F.when(is_http, F.lit("http")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.when((hh / 2).cast("bigint") % 2 == 0, F.lit("WWW.")).otherwise(
            F.lit("")
        ),
        F.col("source"),
        F.lit(".Example."),
        F.when((hh / 4).cast("bigint") % 2 == 0, F.lit("COM")).otherwise(
            F.lit("org")
        ),
        F.when((hh / 8).cast("bigint") % 3 == 0, F.lit(""))
        .when(
            (hh / 8).cast("bigint") % 3 == 1,
            F.when(is_http, F.lit(":80")).otherwise(F.lit(":443")),
        )
        .otherwise(F.lit(":8080")),
        F.lit("/p/"),
        (F.col("doc_id") % 7).cast("string"),
        F.when((hh / 24).cast("bigint") % 2 == 0, F.lit("/")).otherwise(
            F.lit("")
        ),
        F.lit("?"),
        F.when(
            (hh / 48).cast("bigint") % 2 == 0,
            F.concat(
                F.lit("id="), (F.col("doc_id") % 50).cast("string"),
                F.lit("&utm_source=feed"),
            ),
        ).otherwise(
            F.concat(
                F.lit("utm_source=feed&id="),
                (F.col("doc_id") % 50).cast("string"),
            )
        ),
        F.when((hh / 96).cast("bigint") % 2 == 0, F.lit("&ref=x")).otherwise(
            F.lit("")
        ),
        F.when((hh / 192).cast("bigint") % 2 == 0, F.lit("#top")).otherwise(
            F.lit("")
        ),
    )
    raw = docs.select("doc_id", url.alias("url"))

    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace("url", r"^[A-Za-z]+://", ""), r"#.*$", ""
    )
    parts = raw.select(
        "doc_id", "url", scheme.alias("scheme"), rest.alias("rest")
    )
    hostport = F.regexp_extract("rest", r"^([^/?]+)", 1)
    comp = parts.select(
        "doc_id", "url", "scheme",
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")).alias("host"),
        F.regexp_extract(hostport, r":([0-9]+)$", 1).alias("port"),
        F.regexp_replace(
            F.regexp_replace("rest", r"^[^/?]+", ""), r"\?.*$", ""
        ).alias("path"),
        F.regexp_extract("rest", r"\?(.*)$", 1).alias("query"),
    )
    host_c = F.regexp_replace("host", r"^www\.", "")
    keep_port = (F.col("port") != "") & ~(
        ((F.col("scheme") == "http") & (F.col("port") == "80"))
        | ((F.col("scheme") == "https") & (F.col("port") == "443"))
    )
    port_c = F.when(keep_port, F.concat(F.lit(":"), F.col("port"))).otherwise(
        F.lit("")
    )
    path_c = F.when(F.col("path").isin("", "/"), F.lit("/")).otherwise(
        F.regexp_replace("path", r"/$", "")
    )
    query_c = F.array_join(
        F.array_sort(
            F.filter(
                F.split("query", "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    return comp.select(
        "doc_id", "url", "scheme",
        host_c.alias("host_c"), port_c.alias("port_c"),
        path_c.alias("path_c"), query_c.alias("query_c"),
    )


@register(
    "curation_domain_quota_sample",
    f"""
    WITH {_URL_CANON_CTES},
    dom AS (
      SELECT doc_id,
             regexp_extract(regexp_replace(host_c, '^www\\.', ''),
                            '([^.]+\\.[^.]+)$', 1) AS registrable_domain
      FROM canon
    ), ranked AS (
      SELECT doc_id, registrable_domain,
             ROW_NUMBER() OVER (
               PARTITION BY registrable_domain
               ORDER BY md5('q:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS domain_rank,
             COUNT(*) OVER (PARTITION BY registrable_domain) AS domain_total
      FROM dom
    )
    SELECT doc_id, registrable_domain,
           CAST(domain_rank AS BIGINT) AS domain_rank,
           CAST(domain_total AS BIGINT) AS domain_total,
           domain_rank <= 120 AS kept
    FROM ranked
    """,
    doc="Per-domain quota sampling (host-level downsampling) — the "
        "crawl-curation step after URL canonicalization: cap every "
        "registrable domain at K=120 docs so no domain dominates the "
        "training mix (the C4/RefinedWeb per-host cap shape).  Selection "
        "rank is the md5 hash order of doc_id (deterministic, "
        "layout-independent, and temporally unbiased — doc_id order would "
        "systematically prefer old pages), tie-broken by doc_id; output "
        "keeps EVERY doc with its rank, domain total, and kept bit so the "
        "sampling decision is auditable.  Plan: the shared synthesized-URL "
        "canonical chain (map-only string surgery), then ONE window "
        "shuffle keyed registrable_domain carrying (doc_id, domain) only "
        "— at 100 TB the quota pass moves ~16 bytes/doc through a single "
        "exchange; a skewed mega-domain bounds one partition, mitigated "
        "by the same two-pass count+rank split the topk family documents",
)
def curation_domain_quota_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    canon = _synth_canon_urls(spark, sf_dir)
    dom = canon.select(
        "doc_id",
        F.regexp_extract(
            F.regexp_replace("host_c", r"^www\.", ""),
            r"([^.]+\.[^.]+)$", 1,
        ).alias("registrable_domain"),
    )
    order_key = F.md5(F.concat(F.lit("q:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("registrable_domain").orderBy(
        order_key, F.col("doc_id")
    )
    wtot = Window.partitionBy("registrable_domain")
    return dom.select(
        "doc_id", "registrable_domain",
        F.row_number().over(w).cast("bigint").alias("domain_rank"),
        F.count(F.lit(1)).over(wtot).cast("bigint").alias("domain_total"),
        (F.row_number().over(w) <= 120).alias("kept"),
    )
