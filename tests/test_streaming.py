"""Streaming twins vs the batch engine on the same static input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.oracle import make_events_updates
from bgp_feature_extractor_spark.operators.asof import classify_window
from bgp_feature_extractor_spark.streaming.stream_features import (
    read_event_stream,
    run_to_memory,
    stream_bin_counts,
    stream_classify,
    stream_sessions,
)
from tests.conftest import events_sdf

CFG = EngineConfig()


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    ev = make_events_updates(n_events=1200, n_sources=4)
    path = str(tmp_path_factory.mktemp("stream") / "events")
    events_sdf(spark, ev).repartition(4).write.parquet(path)
    return ev, path


def test_stream_classify_matches_batch(spark, staged):
    ev, path = staged
    got = run_to_memory(stream_classify(read_event_stream(spark, path), CFG), "cls_out")
    got_counts = {}
    for r in got:
        got_counts[r["cls"]] = got_counts.get(r["cls"], 0) + 1
    want = {
        r["cls"]: r["n"]
        for r in classify_window(events_sdf(spark, ev), None, CFG)
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_counts == want


def test_stream_bin_counts_totals(spark, staged):
    ev, path = staged
    # complete mode: append would hold back windows above the final
    # watermark, which never close on a finite static input
    rows = run_to_memory(
        stream_bin_counts(read_event_stream(spark, path), CFG), "bins_out", "complete"
    )
    total_ann = sum(r["announcements"] for r in rows)
    assert total_ann == (ev["kind"] == "ann").sum()


def test_stream_sessions_runs(spark, staged):
    _, path = staged
    rows = run_to_memory(
        stream_sessions(read_event_stream(spark, path)), "sess_out", "complete"
    )
    assert sum(r["n_events"] for r in rows) > 0


def _staged_docs(spark, tmp_path) -> str:
    """File streaming sources need a DIRECTORY; stage the docs table."""
    path = str(tmp_path / "docs_stream")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicates on the content hash keeps exactly one doc
    per distinct text — same distinct-key set as batch dedup_exact."""
    from bgp_feature_extractor_spark.operators.dedup import dedup_exact
    from bgp_feature_extractor_spark.streaming.stream_features import (
        read_document_stream,
        run_to_memory,
        stream_dedup_exact,
    )

    path = _staged_docs(spark, tmp_path)
    rows = run_to_memory(
        stream_dedup_exact(read_document_stream(spark, path)), "dedup_out"
    )
    got_keys = {r["content_key"] for r in rows}
    assert len(rows) == len(got_keys), "stream emitted a duplicate content key"
    batch = dedup_exact(spark.read.parquet(path), ["text"], "doc_id")
    want_keys = {r["content_key"] for r in batch.select("content_key").collect()}
    assert got_keys == want_keys


def test_stream_text_stats_matches_batch(spark, tmp_path):
    """Stateless projections are batch==stream by construction; assert it."""
    from bgp_feature_extractor_spark.functions import text as TX
    from bgp_feature_extractor_spark.streaming.stream_features import (
        read_document_stream,
        run_to_memory,
        stream_text_stats,
    )
    from pyspark.sql import functions as F

    path = _staged_docs(spark, tmp_path)
    rows = run_to_memory(
        stream_text_stats(read_document_stream(spark, path)), "txt_out"
    )
    got = {r["doc_id"]: (r["n_words"], r["fingerprint"]) for r in rows}
    t = F.col("text")
    batch = spark.read.parquet(path).select(
        "doc_id",
        TX.token_count(t).cast("long").alias("n_words"),
        TX.fingerprint(t).alias("fingerprint"),
    )
    want = {r["doc_id"]: (r["n_words"], r["fingerprint"]) for r in batch.collect()}
    assert got == want
