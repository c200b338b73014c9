"""End-to-end LLM training-corpus preparation pipeline.

Composes the engine's text / dedup operators into the standard corpus
funnel a 100TB training-data job runs before tokenization:

    quality gate -> exact dedup -> near-dup removal (MinHash LSH) -> stats

Physical shape (and why it scales):
  * the quality gate is pure JVM column expressions evaluated in the scan
    stage — rejected documents never reach a shuffle;
  * exact dedup shuffles the md5 content key (fixed 128-bit), not the
    text, and keeps min(doc_id) per key — one hash aggregate + one
    semi-join back;
  * near-dup candidates come from banded MinHash LSH (one JVM ``aggregate``
    fold per doc for the signature, equi-join on hash-uniform band keys),
    never an all-pairs block join;
  * the drop policy is single-pass and deterministic: a doc is dropped iff
    it collides in some band with a SMALLER surviving doc_id ("keep the
    earliest member of each candidate pair"). This is the standard greedy
    relaxation of connected-component dedup — no iterative union-find job,
    one anti-join — and is exactly SQL-expressible, so the whole funnel
    has a DuckDB oracle twin in ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.functions.text import (
    quality_score,
    token_count,
    word_hash_tokens,
)
from bgp_feature_extractor_spark.operators.dedup import minhash_lsh_pairs


def corpus_prep(
    docs: DataFrame,
    min_quality: float = 0.3,
    min_words: int = 5,
    n_hashes: int = 32,
    bands: int = 4,
    quality_round: int = 6,
) -> DataFrame:
    """documents(doc_id, source, lang, text) -> surviving docs with stats.

    ``quality_round``: the gate compares the quality score ROUNDED to this
    many digits so engine and oracle agree on boundary values regardless
    of float formatting."""
    t = F.col("text")
    stats = docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        token_count(t).cast("long").alias("n_words"),
        F.round(quality_score(t), quality_round).alias("quality"),
    )
    gated = stats.filter(
        (F.col("quality") >= F.lit(min_quality)) & (F.col("n_words") >= F.lit(min_words))
    )
    # exact dedup: keep the smallest doc_id per content key
    ex = gated.withColumn("content_key", F.md5("text"))
    keep = ex.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    uniq = ex.join(keep, ["content_key", "doc_id"]).drop("content_key")
    # near-dup removal: LSH band collision against a smaller id => drop
    toks = uniq.select("doc_id", word_hash_tokens(F.col("text")).alias("tokens"))
    pairs = minhash_lsh_pairs(toks, "doc_id", "tokens", n_hashes=n_hashes, bands=bands)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        uniq.join(drops, "doc_id", "left_anti")
        .select("doc_id", "source", "lang", "n_words", "quality")
    )
