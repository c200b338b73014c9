"""Adapters from stored tables to the engine's flat event schema
(source, doc_id, ts, seq, kind, tokens, origin, attrs_sig).

The reference's "source" is an MRT decode (SURVEY.md §2.1 S2); the engine's
authoritative input is the BASELINE.json input_hint table of pre-tokenized
sequences. The /root/testdata tables are mapped deterministically so the
same derivation is expressible in ANSI SQL for the DuckDB oracle:

  * sequences(doc_id, tokens, n_tok, source [, seq]) -> announcements with
    ts derived monotone per source from the explicit order column.
  * documents(doc_id, text, lang, source, n_chars)   -> synthetic update
    stream: entity = doc_id % entities, withdraw when n_chars % 7 == 0,
    tokens = ascii(first char) per word, origin = n_chars % 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequences_to_events(seqs: DataFrame, t0: int = 0, delta: int = 1) -> DataFrame:
    """input_hint table -> announcement stream. Requires an explicit
    within-source order column ``seq`` (parquet row order is not stable
    under parallel scan; FIXTURES.md §1 derives ts = t0 + seq*delta)."""
    return seqs.select(
        "source",
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.lit(t0) + F.col("seq").cast("long") * F.lit(delta)).alias("ts"),
        F.col("seq").cast("long").alias("seq"),
        F.lit("ann").alias("kind"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.coalesce(F.col("origin"), F.lit(0)).alias("origin")
        if "origin" in seqs.columns
        else F.lit(0).alias("origin"),
        F.expr("map()").cast("map<string,string>").alias("attrs_sig"),
    )


def resolve_peer_index(entries: DataFrame, peer_index: DataFrame) -> DataFrame:
    """RIB v2 snapshot resolution (SURVEY.md §2.1 S4 / §2.4 J3,
    bgpmetrics_as.py:321-334): snapshot entries carry a positional
    ``peer_index`` that resolves to the peer/source id through a tiny
    dimension table built from the PEER_INDEX_TABLE record.

    Spark shape: broadcast hash join — the index table is a few hundred
    rows regardless of snapshot size, so the snapshot scan never shuffles.
    Expects ``entries(peer_index, doc_id, tokens, origin, attrs_sig, ...)``
    and ``peer_index(peer_index, source)``; returns entries with ``source``
    resolved and the positional column dropped."""
    resolved = entries.join(F.broadcast(peer_index), "peer_index", "inner")
    return resolved.drop("peer_index")


def documents_to_events(docs: DataFrame, entities: int = 50) -> DataFrame:
    """documents table -> deterministic update stream (SQL-mirrorable; the
    DuckDB twin lives in __spark_entry__.oracle_sql)."""
    is_wd = (F.col("n_chars") % 7) == 0
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    tokens = F.transform(words, lambda x: F.ascii(F.substring(x, 1, 1)))
    return docs.select(
        "source",
        F.concat(F.lit("e"), (F.col("doc_id") % entities).cast("string")).alias("doc_id"),
        F.col("doc_id").cast("long").alias("ts"),
        F.col("doc_id").cast("long").alias("seq"),
        F.when(is_wd, F.lit("wd")).otherwise(F.lit("ann")).alias("kind"),
        F.when(~is_wd, tokens).alias("tokens"),
        F.when(~is_wd, (F.col("n_chars") % 3).cast("int")).alias("origin"),
        F.when(~is_wd, F.create_map(F.lit("lang"), F.col("lang"))).alias("attrs_sig"),
    )
