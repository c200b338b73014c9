"""Source adapters: input_hint sequences, document stream, RIB v2
peer-index resolution (SURVEY.md §2.1 S3/S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bgp_feature_extractor_spark.sources.adapters import (
    resolve_peer_index,
    sequences_to_events,
)


def test_sequences_to_events_monotone_ts(spark):
    seqs = spark.createDataFrame(
        [("s1", "d1", [1, 2], 2, 0), ("s1", "d2", [3], 1, 1), ("s2", "d1", [9], 1, 0)],
        "source string, doc_id string, tokens array<int>, n_tok int, seq long",
    )
    ev = sequences_to_events(seqs, t0=100, delta=5).toPandas()
    assert set(ev.columns) >= {"source", "doc_id", "ts", "seq", "kind", "tokens"}
    s1 = ev[ev.source == "s1"].sort_values("seq")
    assert list(s1.ts) == [100, 105]
    assert (ev.kind == "ann").all()


def test_resolve_peer_index_broadcast_join(spark):
    entries = spark.createDataFrame(
        [(0, "p1", [1]), (1, "p2", [2]), (0, "p3", [3]), (7, "px", [4])],
        "peer_index int, doc_id string, tokens array<int>",
    )
    idx = spark.createDataFrame(
        [(0, "as65000"), (1, "as65001")], "peer_index int, source string"
    )
    out = resolve_peer_index(entries, idx)
    pdf = out.toPandas().sort_values("doc_id")
    # unresolvable index rows are dropped (inner join, reference keys the
    # lookup dict by known peers only)
    assert list(pdf.doc_id) == ["p1", "p2", "p3"]
    assert list(pdf.source) == ["as65000", "as65001", "as65000"]
    assert "peer_index" not in pdf.columns
    # physical plan: dim side is broadcast, no shuffle of the entries scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
