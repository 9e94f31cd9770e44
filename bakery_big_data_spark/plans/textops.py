"""Text-analysis queries over ``documents.parquet`` — token statistics,
quality scoring, stopword language-ID, and rolling-hash fingerprinting.

LLM-data-pipeline extension family.  Everything is built-in string/array
expressions (``split``/``transform``/``filter``/``aggregate``) — JVM-side,
no UDFs; per-document work is linear in text length and fully map-parallel
(no shuffle in any of these plans), so the operators stream at 100 TB.

The quality query reuses the engine's generic rule fold
(:mod:`bakery_big_data_spark.quality`) — same operator the reference applies
between Bronze and Silver (``bronze_to_silver.py:23-33``), applied to text
features instead of sales rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bakery_big_data_spark.operators.cache import PlanCache
from bakery_big_data_spark.plans.base import DEC, register, spread, t
from bakery_big_data_spark.quality import QualityRule, apply_quality_rules

#: Persisted per-(session, sf) artifacts shared by multiple query rows:
#: the BPE (merge table, encoded vocab) pair — learn + encode rows — and
#: the BM25 scored frame — retrieval row + hybrid-RRF lexical leg.
_TEXT_CACHE = PlanCache(max_entries=4)

_MOD = 2147483647  # 2^31-1, same arithmetic in BIGINT on both engines

_STOPWORDS = {
    "en": ("the", "a"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
    "fr": ("le", "les", "une"),
}


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def _adjacent_pairs(ws: str) -> Column:
    """Adjacent (w1, w2) token pairs, matching the oracles' empty-range
    semantics: DuckDB's ``generate_series(1, 0)`` is empty, but Spark's
    ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` and ``element_at(ws, 0)``
    throws INVALID_INDEX_OF_ZERO — so a 1-token (or null-text, size=-1)
    document must short-circuit to zero pairs before the sequence is built.
    ``explode`` then drops the empty-array row on both engines."""
    idx = F.when(
        F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.element_at(ws, i + 1).alias("w2"),
        ),
    )


def _adjacent_triples(ws: str) -> Column:
    """Adjacent (w1, w2, w3) token triples with the same empty-range
    short-circuit as :func:`_adjacent_pairs` (a <3-token or null-text doc
    must yield zero triples, not a descending Spark ``sequence``)."""
    idx = F.when(
        F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.element_at(ws, i + 1).alias("w2"),
            F.element_at(ws, i + 2).alias("w3"),
        ),
    )


#: GPT-2-shaped pretokenizer classes restricted to constructs whose
#: semantics are identical in Java regex (Spark) and DuckDB's RE2:
#: optional leading space + letter run | digit run | punctuation run.
_BPE_ISH_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len(ws) AS n_tokens,
           len(list_distinct(ws)) AS n_distinct_tokens,
           CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS type_token_ratio,
           CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) / len(ws)
             AS avg_token_len,
           len(regexp_extract_all(text, '{_BPE_ISH_RE}')) AS n_bpe_tokens
    FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
    """,
    doc="Token counting + lexical-diversity stats: whitespace tokenizer "
        "(count, vocabulary, type-token ratio, mean token length) plus a "
        "BPE-ish pretokenizer count (GPT-2-shaped regex: space-prefixed "
        "letter/digit/punctuation runs — the token-budget estimator an LLM "
        "data pipeline uses before spending real BPE) — map-only, "
        "engine-identical regex subset",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = _tokens("text")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    tok_chars = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        (nd.cast("double") / n).alias("type_token_ratio"),
        (tok_chars.cast("double") / n).alias("avg_token_len"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_ISH_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


@register(
    "text_quality_score",
    """
    SELECT doc_id,
           CAST(100
             - (CASE WHEN COALESCE(n_tokens >= 20, FALSE) THEN 0 ELSE 25 END)
             - (CASE WHEN COALESCE(has_stop, FALSE) THEN 0 ELSE 15 END)
             - (CASE WHEN COALESCE(ttr >= 0.10, FALSE) THEN 0 ELSE 30 END)
             - (CASE WHEN COALESCE(n_chars BETWEEN 50 AND 5000, FALSE) THEN 0 ELSE 30 END)
           AS INT) AS data_quality_score
    FROM (
      SELECT doc_id, n_chars,
             len(ws) AS n_tokens,
             list_has_any(ws, ['the', 'a']) AS has_stop,
             CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr
      FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents)
    )
    """,
    doc="Document quality scoring with the generic penalty-rule fold "
        "(quality.py; reference bronze_to_silver.py:23-33 semantics): token "
        "floor, stopword presence, lexical diversity, length band",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = _tokens("text")
    feats = d.select(
        "doc_id",
        "n_chars",
        F.size(ws).alias("n_tokens"),
        F.arrays_overlap(ws, F.array(F.lit("the"), F.lit("a"))).alias(
            "has_stop"
        ),
        (F.size(F.array_distinct(ws)).cast("double") / F.size(ws)).alias(
            "ttr"
        ),
    )
    rules = [
        QualityRule("min_tokens", F.col("n_tokens") >= 20, 25),
        QualityRule("has_stopwords", F.col("has_stop"), 15),
        QualityRule("diversity", F.col("ttr") >= 0.10, 30),
        QualityRule("length_band", F.col("n_chars").between(50, 5000), 30),
    ]
    return apply_quality_rules(feats, rules).select(
        "doc_id", "data_quality_score"
    )


def _lang_scores() -> dict[str, Column]:
    ws = _tokens("text")
    return {
        lang: F.size(
            F.filter(ws, lambda w: w.isin(*stops))
        ).alias(f"score_{lang}")
        for lang, stops in _STOPWORDS.items()
    }


@register(
    "text_language_id",
    f"""
    SELECT doc_id, score_en, score_de, score_es, score_fr,
           CASE
             WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM (
      SELECT doc_id,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['en'])}, w))) AS score_en,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['de'])}, w))) AS score_de,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['es'])}, w))) AS score_es,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['fr'])}, w))) AS score_fr
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    """,
    doc="Stopword-vote language identification (n-gram-heuristic family): "
        "per-language stopword hit counts, argmax with fixed precedence — a "
        "deterministic classifier demo (the synthetic corpus's text is "
        "language-independent, so this scores the heuristic, not the label)",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    scores = _lang_scores()
    scored = d.select("doc_id", *scores.values())
    e, g, s, fr = (F.col(f"score_{x}") for x in ("en", "de", "es", "fr"))
    return scored.withColumn(
        "predicted_lang",
        F.when((e >= g) & (e >= s) & (e >= fr), "en")
        .when((g >= s) & (g >= fr), "de")
        .when(s >= fr, "es")
        .otherwise("fr"),
    )


@register(
    "text_fingerprint_rolling_hash",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split(text, ''), c -> c <> ''),
                 c -> CAST(unicode(c) AS BIGINT))),
             (a, c) -> (a * 31 + c) % {_MOD}) AS content_hash,
           list_min(
             list_transform(string_split(text, ' '),
               w -> list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(
                     list_filter(string_split(w, ''), c -> c <> ''),
                     c -> CAST(unicode(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % {_MOD}))) AS min_token_hash
    FROM documents
    """,
    doc="Document fingerprinting: polynomial rolling hash over characters "
        "(mod 2^31-1 — pure BIGINT arithmetic, engine-independent unlike "
        "xxhash) + min-token-hash sketch; map-only fold per document",
)
def text_fingerprint_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")

    def roll(chars_src: Column, init: int) -> Column:
        codes = F.transform(
            F.filter(F.split(chars_src, ""), lambda c: c != ""),
            lambda c: F.ascii(c).cast("bigint"),
        )
        return F.aggregate(
            codes,
            F.lit(init).cast("bigint"),
            lambda a, c: (a * 31 + c) % _MOD,
        )

    min_tok = F.array_min(
        F.transform(_tokens("text"), lambda w: roll(w, 7))
    )
    return d.select(
        "doc_id",
        roll(F.col("text"), 0).alias("content_hash"),
        min_tok.alias("min_token_hash"),
    )


@register(
    "text_analysis_profile",
    f"""
    SELECT doc_id,
           n_tokens,
           n_distinct_tokens,
           type_token_ratio,
           avg_token_len,
           n_bpe_tokens,
           CAST(100
             - (CASE WHEN COALESCE(n_tokens >= 20, FALSE) THEN 0 ELSE 25 END)
             - (CASE WHEN COALESCE(has_stop, FALSE) THEN 0 ELSE 15 END)
             - (CASE WHEN COALESCE(type_token_ratio >= 0.10, FALSE) THEN 0 ELSE 30 END)
             - (CASE WHEN COALESCE(n_chars BETWEEN 50 AND 5000, FALSE) THEN 0 ELSE 30 END)
           AS INT) AS data_quality_score,
           CASE
             WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM (
      SELECT doc_id, n_chars,
             len(ws) AS n_tokens,
             len(list_distinct(ws)) AS n_distinct_tokens,
             CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS type_token_ratio,
             CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) / len(ws)
               AS avg_token_len,
             len(regexp_extract_all(text, '{_BPE_ISH_RE}')) AS n_bpe_tokens,
             list_has_any(ws, ['the', 'a']) AS has_stop,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['en'])}, w))) AS score_en,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['de'])}, w))) AS score_de,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['es'])}, w))) AS score_es,
             len(list_filter(ws, w -> list_contains({list(_STOPWORDS['fr'])}, w))) AS score_fr
      FROM (SELECT doc_id, n_chars, text, string_split(text, ' ') AS ws FROM documents)
    )
    """,
    doc="Single-pass text-analysis profile consolidating the family for the "
        "driver window: token counting + lexical diversity + BPE-ish "
        "pretokenizer budget (text_token_stats), penalty-rule quality fold "
        "(text_quality_score; quality.py engine, reference "
        "bronze_to_silver.py:23-33 semantics), and stopword-vote language "
        "ID (text_language_id) — one map-only projection, tokenized once, "
        "no shuffle; the per-op variants stay registered for bench/pytest",
)
def text_analysis_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = _tokens("text")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    ttr = nd.cast("double") / n
    tok_chars = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    feats = d.select(
        "doc_id",
        "n_chars",
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        ttr.alias("type_token_ratio"),
        (tok_chars.cast("double") / n).alias("avg_token_len"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_ISH_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
        F.arrays_overlap(ws, F.array(F.lit("the"), F.lit("a"))).alias("has_stop"),
        *_lang_scores().values(),
    )
    rules = [
        QualityRule("min_tokens", F.col("n_tokens") >= 20, 25),
        QualityRule("has_stopwords", F.col("has_stop"), 15),
        QualityRule("diversity", F.col("type_token_ratio") >= 0.10, 30),
        QualityRule("length_band", F.col("n_chars").between(50, 5000), 30),
    ]
    e, g, s, fr = (F.col(f"score_{x}") for x in ("en", "de", "es", "fr"))
    return apply_quality_rules(feats, rules).select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "type_token_ratio",
        "avg_token_len",
        "n_bpe_tokens",
        "data_quality_score",
        F.when((e >= g) & (e >= s) & (e >= fr), "en")
        .when((g >= s) & (g >= fr), "de")
        .when(s >= fr, "es")
        .otherwise("fr")
        .alias("predicted_lang"),
    )


@register(
    "text_bigram_lm_counts",
    """
    WITH grams AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> struct_pack(w1 := ws[i], w2 := ws[i + 1])))
               AS g
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)
    ), pair_counts AS (
      SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS n_pair
      FROM grams GROUP BY g.w1, g.w2
    ), ctx AS (
      SELECT w1, SUM(n_pair) AS n_ctx FROM pair_counts GROUP BY w1
    )
    SELECT p.w1, p.w2, p.n_pair,
           CAST(p.n_pair AS DOUBLE) / c.n_ctx AS cond_prob
    FROM pair_counts p JOIN ctx c ON p.w1 = c.w1
    WHERE p.n_pair >= 8
    """,
    doc="Bigram language-model statistics: corpus-wide (w1, w2) counts and "
        "the conditional probability P(w2|w1) = n(w1,w2)/n(w1) — the "
        "count-collection pass of n-gram LM training / contamination "
        "scoring.  Adjacent-pair explode is map-only; both aggregations "
        "key on w1 so the context-total join reuses the pair count's hash "
        "partitioning (no extra exchange, asserted by the no-cartesian "
        "plan test); min-count pruning keeps the output the dense head of "
        "the distribution",
)
def text_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    pairs = (
        d.select(_tokens("text").alias("ws"))
        .select(F.explode(_adjacent_pairs("ws")).alias("g"))
        .select("g.w1", "g.w2")
    )
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    w = Window.partitionBy("w1")
    return (
        pair_counts.withColumn("n_ctx", F.sum("n_pair").over(w))
        .filter(F.col("n_pair") >= 8)
        .select(
            "w1",
            "w2",
            "n_pair",
            (F.col("n_pair").cast("double") / F.col("n_ctx")).alias("cond_prob"),
        )
    )


@register(
    "text_vocab_coverage",
    """
    WITH counts AS (
      SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ), totals AS (SELECT SUM(n) AS total FROM counts),
    ranked AS (
      SELECT w, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, w ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_n
      FROM counts
    )
    SELECT rnk, w, n,
           CAST(cum_n AS DOUBLE) / (SELECT total FROM totals) AS cum_coverage
    FROM ranked WHERE rnk <= 100
    """,
    doc="Tokenizer vocabulary induction: top-100 tokens by corpus frequency "
        "with cumulative coverage share — the report that sizes a "
        "vocabulary (what fraction of the token stream the top-k covers).  "
        "SINGLE-SCAN: the corpus is word-counted once; ranking, the running "
        "coverage sum, AND the grand-total divisor are all windows over the "
        "vocabulary-sized count frame (the total is an unbounded-frame sum "
        "— no second corpus scan, no branch duplication); the corpus-level "
        "work is one map-side-combinable aggregation",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = (F.desc("n"), F.asc("w"))
    w = Window.orderBy(*order)
    cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # Grand total as an unbounded frame over the SAME vocab-sized frame —
    # reuses the single word-count, no second lineage for the divisor.
    tot = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .withColumn("cum_n", F.sum("n").over(cum))
        .withColumn("_total", F.sum("n").over(tot))
        .filter(F.col("rnk") <= 100)
        .select(
            "rnk",
            "w",
            "n",
            (F.col("cum_n").cast("double") / F.col("_total")).alias("cum_coverage"),
        )
    )


@register(
    "text_lm_quality_score",
    """
    WITH pairs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> struct_pack(w1 := ws[i], w2 := ws[i + 1])))
               AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ), flat AS (
      SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM pairs
    ), model AS (
      SELECT w1, w2,
             CAST(COUNT(*) AS DOUBLE)
               / SUM(COUNT(*)) OVER (PARTITION BY w1) AS p
      FROM flat WHERE doc_id % 2 = 0
      GROUP BY w1, w2
    )
    SELECT f.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR(COALESCE(m.p, 0.0) * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12 / COUNT(*) AS mean_cond_prob,
           COUNT(m.p) AS n_known
    FROM flat f LEFT JOIN model m ON f.w1 = m.w1 AND f.w2 = m.w2
    WHERE f.doc_id % 2 = 1
    GROUP BY f.doc_id
    """,
    doc="LM-based quality scoring (the perplexity-filter pattern of corpus "
        "curation, KenLM-style): a bigram model is fitted on the train "
        "half (even doc_ids) and every held-out doc is scored by its mean "
        "conditional probability — unseen bigrams score 0, n_known tracks "
        "model coverage.  Mean-of-probabilities instead of mean-log: "
        "probabilities are exact count ratios and the floor-quantized "
        "(1e-12) integer-summed mean is bit-identical cross-engine, while "
        "ln() is not guaranteed correctly-rounded across libms.  One exploded-pairs lineage "
        "feeds both the model aggregation and the scoring join; the "
        "model (vocab², counts-reduced) broadcasts at this scale and "
        "shuffle-joins on (w1, w2) beyond it",
)
def text_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    flat = (
        d.select("doc_id", _tokens("text").alias("ws"))
        .select("doc_id", F.explode(_adjacent_pairs("ws")).alias("g"))
        .select("doc_id", "g.w1", "g.w2")
    )
    wctx = Window.partitionBy("w1")
    model = (
        flat.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .select(
            "w1",
            "w2",
            (
                F.col("n_pair").cast("double") / F.sum("n_pair").over(wctx)
            ).alias("p"),
        )
    )
    scored = (
        flat.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(model), ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # floor-quantize each probability before the cross-row sum —
            # a DECIMAL cast of a full-mantissa double can round apart
            # cross-engine at a 1-ulp midpoint (half-up vs half-even);
            # floor() is bit-identical and the BIGINT sum order-free
            (
                F.sum(
                    F.floor(
                        F.coalesce(F.col("p"), F.lit(0.0)) * 1e12
                    ).cast("bigint")
                )
                .cast("double")
                / F.lit(1e12)
                / F.count(F.lit(1))
            ).alias("mean_cond_prob"),
            F.count("p").alias("n_known"),
        )
    )
    return scored


#: keep gate for the interpolated-LM filter: held-out docs whose mean
#: interpolated trigram probability clears this floor survive (tuned so
#: both classes are non-empty at every oracle SF — asserted in
#: tests/test_textops.py)
_PPL_KEEP_MIN = 0.03

#: interpolation weights, strongest model first (KenLM-shaped λ's);
#: written as one left-assoc expression on BOTH engines so the double
#: rounding sequence is identical
_PPL_INTERP = "0.6 * {p3} + 0.3 * {p2} + 0.1 * {p1}"


@register(
    "text_perplexity_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), tri AS (
      SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 2),
                      i -> struct_pack(w1 := ws[i], w2 := ws[i + 1],
                                       w3 := ws[i + 2]))) AS g
        FROM toks)
    ), train AS (
      SELECT * FROM tri WHERE doc_id % 2 = 0
    ), m3 AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS DOUBLE)
               / SUM(COUNT(*)) OVER (PARTITION BY w1, w2) AS p3
      FROM train GROUP BY w1, w2, w3
    ), m2 AS (
      SELECT w2, w3, CAST(COUNT(*) AS DOUBLE)
               / SUM(COUNT(*)) OVER (PARTITION BY w2) AS p2
      FROM train GROUP BY w2, w3
    ), m1 AS (
      SELECT w3, CAST(COUNT(*) AS DOUBLE)
               / SUM(COUNT(*)) OVER () AS p1
      FROM train GROUP BY w3
    ), scored AS (
      SELECT f.doc_id,
             COUNT(*) AS n_trigrams,
             COUNT(m3.p3) AS n_known,
             CAST(SUM(CAST(FLOOR((
               {_PPL_INTERP.format(p3='COALESCE(m3.p3, 0.0)',
                                   p2='COALESCE(m2.p2, 0.0)',
                                   p1='COALESCE(m1.p1, 0.0)')}
             ) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / COUNT(*) AS lm_score
      FROM tri f
      LEFT JOIN m3 ON f.w1 = m3.w1 AND f.w2 = m3.w2 AND f.w3 = m3.w3
      LEFT JOIN m2 ON f.w2 = m2.w2 AND f.w3 = m2.w3
      LEFT JOIN m1 ON f.w3 = m1.w3
      WHERE f.doc_id % 2 = 1
      GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(s.n_known, 0) AS BIGINT) AS n_known,
           COALESCE(s.lm_score, 0.0) AS lm_score,
           COALESCE(s.lm_score, 0.0) >= {_PPL_KEEP_MIN} AS is_kept
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    WHERE d.doc_id % 2 = 1
    """,
    doc="Interpolated-trigram LM perplexity FILTER (r12 verdict task 5a — "
        "the KenLM-shaped quality gate of CCNet/LLaMA-style curation, "
        "generalizing text_lm_quality_score's bigram scorer to a "
        "3-2-1-gram interpolation with a keep/drop verdict): trigram, "
        "bigram and unigram conditionals are estimated on the train half "
        "(even doc_ids) FROM ONE exploded trigram lineage (continuation-"
        "style denominators — c(w1w2w3)/c(w1w2·), c(w2w3·)/c(w2··), "
        "c(w3)/N — so all three models reduce from the same stream), and "
        "every held-out doc is scored with λ=(0.6, 0.3, 0.1) "
        "interpolation; docs whose mean interpolated probability clears "
        "the floor survive.  Mean-of-probabilities instead of mean-log "
        "for the same cross-engine reason as text_lm_quality_score "
        "(count-ratio divisions and the floor-quantized 1e-12 BIGINT sum "
        "are bit-identical; ln() is not), and the verdict thresholds the "
        "monotone score directly.  Plan: one explode feeds three "
        "counts-reduced model aggs and the scoring joins (vocab-sized "
        "shuffles; AQE broadcasts when they fit), then one doc-keyed agg "
        "— trigram-less held-out docs re-enter via the doc-table left "
        "join with score 0 (dropped).  At 100 TB this is the same "
        "two-pass shape as every quality filter here: model fit = one "
        "corpus pass, inference = one corpus pass",
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", _tokens("text").alias("ws")
    )
    tri = d.select(
        "doc_id", F.explode(_adjacent_triples("ws")).alias("g")
    ).select("doc_id", "g.w1", "g.w2", "g.w3")
    train = tri.filter(F.col("doc_id") % 2 == 0)
    # r14 (r13 verdict task 7): the bigram/unigram counts and the train-
    # token total are EXACT rollups of the trigram count table — c(w2,w3)
    # = Σ_w1 c(w1,w2,w3), c(w3) = Σ_(w1,w2), N = Σ_all (every train row
    # is one trigram occurrence).  The former shape re-ran the documents
    # scan + tokenize + explode once per model plus once for N (before-
    # plan: 12 parquet scans, no exchange reuse across the differently-
    # keyed aggregates); one vocab-sized count table, checkpointed, now
    # feeds all four (guide §1.2: one corpus pass for model fit).
    # Integer count rollups are exact, so every probability is
    # bit-identical to the per-model COUNT(*) form the oracle restates.
    base = (
        train.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_n3"))
        .localCheckpoint(eager=True)
    )
    m3 = base.select(
        "w1", "w2", "w3",
        (
            F.col("_n3").cast("double")
            / F.sum("_n3").over(Window.partitionBy("w1", "w2"))
        ).alias("p3"),
    )
    m2 = (
        base.groupBy("w2", "w3")
        .agg(F.sum("_n3").alias("_n2"))
        .select(
            "w2", "w3",
            (
                F.col("_n2").cast("double")
                / F.sum("_n2").over(Window.partitionBy("w2"))
            ).alias("p2"),
        )
    )
    # unigram denominator via a 1-row broadcast cross (the corpus-total
    # idiom of text_vocab_coverage — a global window would single-
    # partition the vocab)
    n_train = base.agg(F.sum("_n3").alias("_nt"))
    m1 = (
        base.groupBy("w3")
        .agg(F.sum("_n3").alias("_n1"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "w3",
            (F.col("_n1").cast("double") / F.col("_nt")).alias("p1"),
        )
    )
    interp = (
        F.lit(0.6) * F.coalesce(F.col("p3"), F.lit(0.0))
        + F.lit(0.3) * F.coalesce(F.col("p2"), F.lit(0.0))
        + F.lit(0.1) * F.coalesce(F.col("p1"), F.lit(0.0))
    )
    scored = (
        tri.filter(F.col("doc_id") % 2 == 1)
        .join(m3, ["w1", "w2", "w3"], "left")
        .join(m2, ["w2", "w3"], "left")
        .join(m1, ["w3"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_n_tri"),
            F.count("p3").alias("_n_known"),
            (
                F.sum(F.floor(interp * 1e12).cast("bigint"))
                .cast("double")
                / F.lit(1e12)
                / F.count(F.lit(1))
            ).alias("_score"),
        )
    )
    held = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 1
    ).select("doc_id")
    return held.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_n_tri"), F.lit(0)).cast("bigint").alias(
            "n_trigrams"
        ),
        F.coalesce(F.col("_n_known"), F.lit(0)).cast("bigint").alias(
            "n_known"
        ),
        F.coalesce(F.col("_score"), F.lit(0.0)).alias("lm_score"),
        (
            F.coalesce(F.col("_score"), F.lit(0.0)) >= _PPL_KEEP_MIN
        ).alias("is_kept"),
    )


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)
               AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)
                                         / CAST(df.df AS DOUBLE) DESC,
                                         tf.term) AS rk
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rk
    FROM scored WHERE rk <= 3
    """,
    doc="TF-IDF top-3 terms per document (linear-idf variant: score = "
        "tf * N / df as ONE double division — IEEE-exact and bit-identical "
        "cross-engine, unlike ln()-idf whose last-ulp differences between "
        "libm implementations can flip rank boundaries; ranking ties break "
        "on the term).  Plan: one explode → (doc, term) hash agg → term "
        "document-frequency agg joined back on term (shuffle join — the "
        "term vocabulary at 100 TB does not fit a broadcast; AQE downgrades "
        "to broadcast when it does) → per-doc top-k window.  The classic "
        "keyword-extraction / relevance primitive the quality-scoring "
        "family feeds on",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


@register(
    "text_repetition_filters",
    """
    WITH base AS (
      SELECT doc_id, text, string_split(text, ' ') AS ws,
             string_split(text, chr(10)) AS lines, len(text) AS tc
      FROM documents
    ), g2 AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(ws) - 1, 0)),
               i -> ws[i] || ' ' || ws[i + 1])) AS g
      FROM base
    ), t2 AS (
      SELECT doc_id, MAX(c * len(g)) AS top2 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(ws) - 2, 0)),
               i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
      FROM base
    ), t3 AS (
      SELECT doc_id, MAX(c * len(g)) AS top3 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1
    ), g5 AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(ws) - 4, 0)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                    || ws[i+3] || ' ' || ws[i+4])) AS g
      FROM base
    ), d5 AS (
      SELECT doc_id,
             SUM(CASE WHEN c > 1 THEN (c - 1) * len(g) ELSE 0 END) AS dup5
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2) GROUP BY 1
    ), m AS (
      SELECT doc_id, tc,
             len(ws) AS n_words,
             CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
               / len(ws) AS mean_word_len,
             CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
               / len(lines) AS dup_line_frac,
             CAST((len(text) - len(replace(text, '#', '')))
                  + (len(text) - len(replace(text, '...', ''))) // 3
                  AS DOUBLE) / len(ws) AS symbol_word_ratio,
             CAST(len(list_filter(lines,
                    l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%'))
                  AS DOUBLE) / len(lines) AS bullet_line_frac,
             CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
               / len(lines) AS ellipsis_line_frac,
             CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
                  AS DOUBLE) / len(ws) AS alpha_word_frac
      FROM base
    )
    SELECT m.doc_id, m.n_words, m.mean_word_len, m.dup_line_frac,
           CAST(COALESCE(t2.top2, 0) AS DOUBLE) / m.tc AS top_2gram_char_frac,
           CAST(COALESCE(t3.top3, 0) AS DOUBLE) / m.tc AS top_3gram_char_frac,
           CAST(COALESCE(d5.dup5, 0) AS DOUBLE) / m.tc AS dup_5gram_char_frac,
           m.symbol_word_ratio, m.bullet_line_frac, m.ellipsis_line_frac,
           m.alpha_word_frac,
           (m.n_words BETWEEN 50 AND 100000
            AND m.mean_word_len BETWEEN 3.0 AND 10.0
            AND m.symbol_word_ratio < 0.1
            AND m.bullet_line_frac < 0.9
            AND m.ellipsis_line_frac < 0.3
            AND m.alpha_word_frac >= 0.8
            AND m.dup_line_frac <= 0.3
            AND CAST(COALESCE(t2.top2, 0) AS DOUBLE) / m.tc <= 0.20
            AND CAST(COALESCE(t3.top3, 0) AS DOUBLE) / m.tc <= 0.18
            AND CAST(COALESCE(d5.dup5, 0) AS DOUBLE) / m.tc <= 0.15)
             AS passes_gopher
    FROM m
    LEFT JOIN t2 ON m.doc_id = t2.doc_id
    LEFT JOIN t3 ON m.doc_id = t3.doc_id
    LEFT JOIN d5 ON m.doc_id = d5.doc_id
    """,
    doc="Gopher/C4 repetition + boilerplate filters (Rae et al. 2021 table "
        "A1; Raffel et al. 2020 §2.2): duplicate-line fraction, dominant "
        "2/3-gram character share, duplicated 5-gram character share, "
        "symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic "
        "word fraction, and the conjunction verdict.  The per-document "
        "n-gram histogram is a SORT + RUN-LENGTH pass over the row's own "
        "gram array (operators/repetition.py) — map-only, zero shuffle — "
        "where the textbook explode→groupBy(doc,gram) would shuffle the "
        "whole token stream at 100 TB.  The oracle recomputes every metric "
        "via the explode route, so the hash ALSO certifies that the "
        "run-length histogram equals the groupBy histogram",
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.repetition import (
        repetition_features,
    )

    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    return repetition_features(d, id_cols=["doc_id"])


def _bpe_oracle(num_merges: int) -> str:
    """Unrolled DuckDB restatement of the BPE merge loop: per round, a
    lateral-unnest adjacent-pair count, a (count DESC, l, r) argmax, and
    the greedy left-to-right merge as a ``list_reduce`` fold over a
    chr(31)-joined accumulator string (the unit separator never occurs in
    the corpus) — each CASE arm mirrors one branch of the Spark fold in
    operators/bpe.py::merge_pair_fold."""
    us = chr(31)
    ctes = [
        """w0 AS (
      SELECT string_split(w, '') AS syms, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    )"""
    ]
    for r in range(1, num_merges + 1):
        ctes.append(f"""p{r} AS (
      SELECT syms[i] AS l, syms[i+1] AS r,
             CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM w{r - 1}, unnest(range(1, len(syms))) AS t(i)
      GROUP BY 1, 2
    )""")
        ctes.append(f"""b{r} AS (
      SELECT l, r, pair_count FROM p{r}
      ORDER BY pair_count DESC, l, r LIMIT 1
    )""")
        ctes.append(f"""w{r} AS (
      SELECT string_split(
               list_reduce(syms, (acc, x) -> CASE
                 WHEN regexp_extract(acc, '[^{us}]*$') = b.l AND x = b.r
                 THEN regexp_replace(acc, '[^{us}]*$', '') || b.l || b.r
                 ELSE acc || chr(31) || x END),
               chr(31)) AS syms, freq
      FROM w{r - 1}, b{r} b
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged_sym, pair_count FROM b{r}"
        for r in range(1, num_merges + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


@register(
    "bpe_vocab_merges",
    _bpe_oracle(8),
    doc="BPE vocabulary induction (Sennrich et al. 2016): 8 rounds of "
        "most-frequent adjacent-symbol-pair merges over the corpus "
        "word-frequency table, ties broken lexicographically — the merge "
        "table (round, left, right, merged, count) is a pure function of "
        "the corpus and is hash-certified against a fully unrolled DuckDB "
        "restatement (per round: lateral-unnest pair count, argmax CTE, "
        "list_reduce greedy merge fold).  Scale: the only corpus-scale "
        "work is the initial word count (map-side-combinable shuffle that "
        "compacts the corpus to its vocabulary); each round after is "
        "O(vocab) — pair agg + TakeOrdered(1) + map-only fold, with the "
        "argmax entering the plan as a lazy 1-row broadcast cross, no "
        "driver round trip (operators/bpe.py)",
)
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merge_table, _ = _bpe_artifacts(spark, sf_dir)
    return merge_table


def _bpe_artifacts(
    spark: SparkSession, sf_dir: str, num_merges: int = 8
) -> tuple[DataFrame, DataFrame]:
    """(merge table, encoded vocabulary) learned ONCE per (session, sf).

    The learn row and the encode row both need the same 8-round merge
    loop; memoizing its two outputs (the _SIG_CACHE/_PAIRS_CACHE
    discipline) means the k sequential rounds — the only
    non-embarrassingly-parallel stage in the text family — run once per
    session instead of once per query build."""
    from bakery_big_data_spark.operators.bpe import bpe_rounds

    def build() -> tuple[DataFrame, DataFrame]:
        d = spread(t(spark, sf_dir, "documents").select("text"))
        bests, vocab = bpe_rounds(d, "text", num_merges)
        if not bests:
            raise ValueError(
                "bpe: corpus has no adjacent symbol pairs — nothing to learn"
            )
        merge_table = bests[0]
        for b in bests[1:]:
            merge_table = merge_table.unionByName(b)
        return (merge_table.persist(), vocab.persist())

    return _TEXT_CACHE.get_or_build(spark, (sf_dir, "bpe", num_merges), build)


def _bpe_encode_oracle(num_merges: int) -> str:
    """The _bpe_oracle CTE chain with the word key carried through every
    fold, finishing with the corpus word stream joined to the encoded
    vocabulary and aggregated per document."""
    us = chr(31)
    ctes = [
        """w0 AS (
      SELECT w, string_split(w, '') AS syms, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    )"""
    ]
    for r in range(1, num_merges + 1):
        ctes.append(f"""p{r} AS (
      SELECT syms[i] AS l, syms[i+1] AS r,
             CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM w{r - 1}, unnest(range(1, len(syms))) AS t(i)
      GROUP BY 1, 2
    )""")
        ctes.append(f"""b{r} AS (
      SELECT l, r, pair_count FROM p{r}
      ORDER BY pair_count DESC, l, r LIMIT 1
    )""")
        ctes.append(f"""w{r} AS (
      SELECT w, string_split(
               list_reduce(syms, (acc, x) -> CASE
                 WHEN regexp_extract(acc, '[^{us}]*$') = b.l AND x = b.r
                 THEN regexp_replace(acc, '[^{us}]*$', '') || b.l || b.r
                 ELSE acc || chr(31) || x END),
               chr(31)) AS syms, freq
      FROM w{r - 1}, b{r} b
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) d JOIN w{num_merges} v USING (w)
    WHERE d.w <> ''
    GROUP BY d.doc_id
    """
    )


@register(
    "bpe_encode_token_counts",
    _bpe_encode_oracle(8),
    doc="Distributed BPE TOKENIZATION with the learned merges — the "
        "apply step completing bpe_vocab_merges' learn step: the encoded "
        "vocabulary (each distinct word's segmentation after 8 merges, "
        "computed exactly once in the merge loop) is joined against the "
        "corpus word stream and aggregated per document into (n_words, "
        "n_bpe_tokens).  This is how production tokenizers scale: encode "
        "the VOCAB, then stream the corpus through a map-side join — "
        "never a per-document re-fold.  The vocab broadcasts at test "
        "scale; a web-scale vocabulary would shuffle-join on the word "
        "key instead (same plan shape, one exchange).  The oracle "
        "re-derives the merge sequence AND the final segmentation via "
        "the unrolled CTE chain, so the hash certifies learn + encode "
        "end to end (operators/bpe.py::bpe_token_counts)",
)
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.bpe import bpe_encode_counts

    _, vocab = _bpe_artifacts(spark, sf_dir)
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    return bpe_encode_counts(vocab, d, "doc_id", "text")


#: BM25 scoring CTE chain through ``scored`` (source-query construction,
#: rational idf, decimal-summed per-doc scores) — shared verbatim by the
#: certified text_bm25_retrieval row and the hybrid-RRF lexical leg.
_BM25_CTES = """tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), dls AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ), stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             COUNT(*) AS n_docs
      FROM dls
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ), srcdf AS (
      SELECT source, term, COUNT(DISTINCT doc_id) AS sdf
      FROM tok GROUP BY source, term
    ), qterms AS (
      SELECT source, term FROM (
        SELECT s.source, s.term,
               ROW_NUMBER() OVER (PARTITION BY s.source
                                  ORDER BY s.sdf DESC, s.term) AS tr
        FROM srcdf s
        JOIN df ON df.term = s.term
        CROSS JOIN stats
        WHERE df.df * 4 <= stats.n_docs
      ) WHERE tr <= 3
    ), contrib AS (
      SELECT q.source, tf.doc_id,
             ((CAST(stats.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
             * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                / (CAST(tf.tf AS DOUBLE)
                   + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE)
                          * (CAST(dls.dl AS DOUBLE) / stats.avgdl))))
               AS c
      FROM qterms q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN dls ON dls.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scored AS (
      SELECT source, doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE) AS score
      FROM contrib GROUP BY source, doc_id
    )"""


@register(
    "text_bm25_retrieval",
    f"""
    WITH {_BM25_CTES}, ranked AS (
      SELECT source, doc_id, n_terms, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rk
      FROM scored
    )
    SELECT source AS query_source, doc_id, n_terms, score, rk
    FROM ranked WHERE rk <= 5
    """,
    doc="BM25 retrieval (k1=1.2, b=0.75): each source's query = its 3 most "
        "characteristic discriminative terms (globally rare, df*4 <= N — "
        "integer predicate, no division — ranked by in-source df), scored "
        "against the whole corpus, top-5 docs per query.  Rational-idf "
        "variant (N-df+0.5)/(df+0.5) — the inside of the standard BM25 "
        "log — keeps every per-term contribution a fixed chain of IEEE "
        "double ops (ln() is not correctly-rounded across libms, the "
        "catalog-wide rule); per-doc scores decimal-sum.  Plan shape at "
        "100 TB: one explode -> (doc,term) and (term) hash aggs; query "
        "terms are a tiny broadcast side; candidate set = docs sharing a "
        "query term (inverted-index semantics via the tf join), never "
        "all docs x all queries; final top-k windows over the "
        "query-partitioned candidate aggregate only",
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    scored = _bm25_scored(spark, sf_dir)
    wr = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("source").alias("query_source"),
            "doc_id",
            "n_terms",
            "score",
            "rk",
        )
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, doc_id, n_terms, score) — the Spark mirror of _BM25_CTES,
    persisted once per (session, sf): the BM25 row and the hybrid-RRF
    lexical leg share it, so the tokenize/tf/df/score pipeline — three
    corpus-scale shuffles — executes once, not per query build."""
    return _TEXT_CACHE.get_or_build(
        spark,
        (sf_dir, "bm25_scored"),
        lambda: _bm25_scored_build(spark, sf_dir).persist(),
    )


def _bm25_scored_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = spread(t(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    dls = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dls.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    srcdf = (
        tok.select("source", "doc_id", "term")
        .distinct()
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("sdf"))
    )
    wq = Window.partitionBy("source").orderBy(
        F.col("sdf").desc(), F.col("term")
    )
    qterms = (
        srcdf.join(df, "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .filter(F.col("df") * 4 <= F.col("n_docs"))
        .withColumn("tr", F.row_number().over(wq))
        .filter(F.col("tr") <= 3)
        .select("source", "term")
    )
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tfp = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (
            F.lit(0.25)
            + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    contrib = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(df, "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("source", "doc_id", (idf * tfp).alias("c"))
    )
    return contrib.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("c").cast(DEC)).cast("double").alias("score"),
    )


_PHRASES = [("batch", "batch"), ("merge", "slow"), ("spark", "table")]


@register(
    "text_phrase_search",
    """
    WITH split AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, ws[g.i] AS tok, g.i AS pos
      FROM split, UNNEST(generate_series(1, len(ws))) AS g(i)
    ), phr AS (
      SELECT * FROM (VALUES ('batch', 'batch'), ('merge', 'slow'),
                            ('spark', 'table')) p(w1, w2)
    )
    SELECT p.w1 || ' ' || p.w2 AS phrase, a.doc_id,
           COUNT(*) AS n_hits
    FROM phr p
    JOIN toks a ON a.tok = p.w1
    JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
               AND b.tok = p.w2
    GROUP BY 1, 2
    """,
    doc="POSITIONAL phrase search — the IR primitive BM25's bag-of-words "
        "scoring cannot express: exact two-word phrase occurrences "
        "(overlap-counting, so 'batch batch batch' scores 2) found by "
        "self-joining the positional inverted index (doc_id, term, pos) "
        "on adjacency (same doc, pos+1).  Scale shape: the index is one "
        "posexplode projection; the first-word side is cut to the tiny "
        "broadcast phrase list BEFORE the positional join, which is "
        "co-partitioned on doc_id — candidate volume is occurrences of "
        "the RARER word, never the corpus; 0- vs 1-based split positions "
        "cancel in the adjacency predicate, making the oracle offset-"
        "proof",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    phrases = spark.createDataFrame(_PHRASES, "w1 string, w2 string")
    a = toks.join(
        F.broadcast(phrases), F.col("tok") == F.col("w1")
    ).select("doc_id", F.col("pos").alias("pa"), "w1", "w2")
    b = toks.select(
        F.col("doc_id").alias("db"),
        F.col("pos").alias("pb"),
        F.col("tok").alias("tb"),
    )
    hits = a.join(
        b,
        (F.col("db") == F.col("doc_id"))
        & (F.col("pb") == F.col("pa") + 1)
        & (F.col("tb") == F.col("w2")),
    )
    return hits.groupBy(
        F.concat_ws(" ", "w1", "w2").alias("phrase"), "doc_id"
    ).agg(F.count(F.lit(1)).alias("n_hits"))


@register(
    "text_feature_hashing",
    """
    SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS feat_value
    FROM (
      SELECT doc_id,
             (('0x' || substr(md5(w), 1, 8))::BIGINT & 2147483647) % 64
               AS bucket,
             CASE WHEN (('0x' || substr(md5(w), 9, 8))::BIGINT & 1) = 1
                  THEN 1 ELSE -1 END AS sign
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''
    )
    GROUP BY doc_id, bucket
    """,
    doc="Feature hashing / the hashing trick (Weinberger et al., ICML "
        "2009): every token maps to one of 64 feature buckets via the "
        "catalog's portable md5-half hash, with a second-half sign bit so "
        "collisions cancel in expectation — the standard "
        "vocabulary-unbounded featurizer for large-scale text training "
        "data.  Map-only token expansion + ONE hash agg keyed "
        "(doc, bucket); output is bounded by docs x 64 regardless of "
        "vocabulary, no dictionary build, no second pass — at 100 TB this "
        "replaces a TF-IDF vocabulary join with a stateless map, and the "
        "whole feature matrix (hash, sign, sum) is bit-identical "
        "cross-engine",
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )

    def half(off: int) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.col("w")), off, 8), 16, 10)
            .cast("bigint")
            .bitwiseAND(F.lit(2147483647))
        )

    return (
        toks.select(
            "doc_id",
            (half(1) % 64).alias("bucket"),
            F.when(half(9).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("bigint").alias("feat_value"))
    )
