"""Corpus-curation operators over the documents table — the selection ops
a training-data pipeline chains AROUND dedup/quality/language analysis:

* latest_per_source — windowed revision dedup: keep the newest document
  per source. Expressed as a max_by AGGREGATE (map-side combine, one
  shuffle keyed by source), not a row_number window — the aggregate form
  never funnels a hot source's full history into one reducer's sort.
* stratified_sample — deterministic per-language sampling by a hash
  bucket of doc_id: a stateless filter that lives in the scan stage
  (no shuffle, no RNG, identical sample on any engine and any re-run —
  Bernoulli RNG sampling would break resume idempotency and oracle
  parity).
* clean_corpus — the end-to-end selection a pretraining pipeline runs:
  drop dedup_pipeline's exact/near duplicates (left-anti join, broadcast
  at typical drop-list sizes), keep detected-language matches, and apply
  integer quality thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats

SAMPLE_BUCKETS = 100


def latest_per_source(documents: DataFrame) -> DataFrame:
    """One row per source: the highest-doc_id (newest) revision."""
    return documents.groupBy("source").agg(
        F.max("doc_id").alias("doc_id"),
        F.max_by("n_chars", "doc_id").alias("n_chars"),
    )


def sample_bucket_col(id_col="doc_id"):
    """Deterministic bucket in [0, 100): first 16 bits of md5(doc_id) mod
    100 — portable integer arithmetic both Spark and any SQL engine
    reproduce bit-for-bit."""
    h16 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return h16 % SAMPLE_BUCKETS


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Keep each doc iff its hash bucket < the percentage configured for
    its lang (metadata lang column; rates in whole percent)."""
    rate = F.lit(default_rate)
    for lang, pct in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return documents.select("doc_id", "lang", "source").where(
        sample_bucket_col() < rate
    )


def clean_corpus(
    documents: DataFrame,
    keep_lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_pct: int = 3,
    jaccard_pct: int = 80,
) -> DataFrame:
    """Training-corpus selection: dedup drop list (exact + near) applied as
    a left-anti join, detected language filter, integer quality gates.
    Output: surviving (doc_id, lang_guess, n_tokens)."""
    drops = dedup.dedup_pipeline(documents, jaccard_pct=jaccard_pct).select("doc_id")
    quality = textstats.quality_stats(documents).select(
        "doc_id", "n_tokens", "n_stopwords"
    )
    lang = textstats.lang_id(documents).select("doc_id", "lang_guess")
    kept = (
        documents.select("doc_id")
        .join(drops, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
    )
    return kept.where(
        (F.col("lang_guess") == keep_lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("n_stopwords") * 100 >= min_stopword_pct * F.col("n_tokens"))
    ).select("doc_id", "lang_guess", "n_tokens")


def dup_ngram_stats(documents: DataFrame, df_threshold: int = 4) -> DataFrame:
    """Duplicate-n-gram quality signal (Gopher/Dolma-style boilerplate
    detection): per document, how many of its distinct word 3-grams occur
    in more than df_threshold documents corpus-wide.

    Two derivations of the gram frame by construction (the doc-frequency
    aggregate is corpus-grain, the hit-count is doc-grain); the join back
    is an equi-join on the gram — AQE broadcasts it when the boilerplate
    vocabulary is small. Docs with <3 words have no grams and are absent,
    matching the MinHash family's convention.

    Output: doc_id, n_grams (distinct), n_boiler, boiler_pct_x100
    (integer basis points — float-free and hash-stable).
    """
    grams = documents.select(
        "doc_id", F.explode(F.array_distinct(dedup.shingles_col())).alias("gram")
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_threshold)
        .select("gram", F.lit(True).alias("is_boiler"))
    )
    joined = grams.join(boiler, "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("is_boiler")).alias("n_boiler"),
        )
        .withColumn("boiler_pct_x100", F.expr("n_boiler * 10000 div n_grams"))
    )
