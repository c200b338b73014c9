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
  * candidates are VERIFIED before any document is dropped: exact Jaccard
    over the distinct word-token sets (the same quantity the MinHash
    signatures approximate) is computed only on the O(candidates) pair
    rows, and a pair below ``jaccard_threshold`` survives. Raw band
    collisions are guaranteed false positives at 100TB scale (32 hashes /
    4 bands), and silently deleting non-duplicate training documents is a
    data-loss bug (VERDICT r2 #3);
  * the drop policy is single-pass, deterministic and plain GREEDY: a doc
    is dropped iff some verified pair has it as the larger doc_id — even
    when the smaller partner was itself dropped (in a chain (1,2),(2,3),
    doc 3 is dropped although its only partner 2 is gone too). This is the
    standard greedy relaxation of connected-component dedup — no iterative
    union-find job, one anti-join — and is exactly SQL-expressible, so the
    whole funnel has a DuckDB oracle twin in
    ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.functions.text import (
    quality_score_w,
    word_hash_tokens,
    words,
)
from bgp_feature_extractor_spark.operators.dedup import minhash_lsh_pairs


def corpus_prep(
    docs: DataFrame,
    min_quality: float = 0.3,
    min_words: int = 5,
    n_hashes: int = 32,
    bands: int = 4,
    quality_round: int = 6,
    jaccard_threshold: float = 0.8,
    caches: list | None = None,
) -> DataFrame:
    """documents(doc_id, source, lang, text) -> surviving docs with stats.

    ``quality_round``: the gate compares the quality score ROUNDED to this
    many digits so engine and oracle agree on boundary values regardless
    of float formatting.

    ``jaccard_threshold``: minimum exact word-set Jaccard for a candidate
    pair to count as a near-duplicate; band collisions below it survive.

    ``caches``: pass a list to persist the multiply-read intermediates
    (survivors of the exact dedup, their token sets, the LSH signature
    frame) and receive them for caller-controlled unpersist — without it
    the gate + md5-dedup subtree re-executes under every consumer
    (4 subtrees at the funnel tail)."""
    t = F.col("text")
    # word arrays projected once, stats via the *_w twins (functions/text.py)
    wd = docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        words(t).alias("_w"),
        words(F.lower(t)).alias("_wl"),
    )
    stats = wd.select(
        "doc_id",
        "source",
        "lang",
        "text",
        F.size("_w").cast("long").alias("n_words"),
        F.round(quality_score_w(F.col("_w"), F.col("_wl"), t), quality_round).alias(
            "quality"
        ),
    )
    gated = stats.filter(
        (F.col("quality") >= F.lit(min_quality)) & (F.col("n_words") >= F.lit(min_words))
    )
    # exact dedup: keep the smallest doc_id per content key
    ex = gated.withColumn("content_key", F.md5("text"))
    keep = ex.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    uniq = ex.join(keep, ["content_key", "doc_id"]).drop("content_key")
    if caches is not None:
        uniq = uniq.persist()
        caches.append(uniq)
    # near-dup removal: LSH band candidates, VERIFIED by exact Jaccard over
    # the distinct word-token sets before the larger id is dropped — the
    # set intersection runs only on the O(candidates) pair rows
    toks = uniq.select(
        "doc_id", F.array_distinct(word_hash_tokens(F.col("text"))).alias("tokens")
    )
    if caches is not None:
        toks = toks.persist()
        caches.append(toks)
    # collapse=False, measured (gated A/B at sf0.1: 4.8s vs 6.3s full):
    # near-duplicate docs here DO share full signatures (3.28M candidate
    # pairs from 4,992 exact-unique docs), but the collapse cannot shrink
    # the candidate OUTPUT — the verify stage consumes every pair either
    # way — so its group-window + expansion joins only add stages. The
    # collapse pays off when the terminal distinct is the sink (see
    # q_minhash_lsh), not when pairs feed a further join.
    pairs = minhash_lsh_pairs(
        toks, "doc_id", "tokens", n_hashes=n_hashes, bands=bands, caches=caches,
        collapse=False,
    )
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("tokens").alias("tok_a"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("tokens").alias("tok_b"))
    inter = F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b")))
    union = F.size("tok_a") + F.size("tok_b") - inter
    verified = (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .filter((inter / union) >= F.lit(jaccard_threshold))
    )
    drops = verified.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        uniq.join(drops, "doc_id", "left_anti")
        .select("doc_id", "source", "lang", "n_words", "quality")
    )
