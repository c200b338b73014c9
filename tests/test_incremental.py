"""S1+S5 composition: resumable feature extraction over the partitioned
event layout — kill mid-run, resume, byte-identical to the one-shot path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.plans.incremental import extract_from_partitioned
from bgp_feature_extractor_spark.sources.checkpoint import CheckpointManager
from bgp_feature_extractor_spark.sources.partitioned import write_partitioned_events
from bgp_feature_extractor_spark.sources.synth import synth_events

CFG = EngineConfig()


def _sorted_pdf(df):
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    return pdf.sort_values(["source", "bin"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def part_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inc") / "events_part")
    # spread the synth span over 3 calendar days so the day partitioning is
    # real (deterministic per-entity shift keeps (ts, seq) ordering valid)
    ev = synth_events(spark, 20_000, n_sources=6).withColumn(
        "ts", F.col("ts") + F.pmod(F.xxhash64("doc_id"), F.lit(3)) * 86_400
    )
    write_partitioned_events(ev, path)
    return path, ev


def test_kill_resume_equals_one_shot(spark, part_events, tmp_path):
    path, ev = part_events
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), n_buckets=8)

    # first run dies after ONE bucket group (2 buckets of 8)
    partial = extract_from_partitioned(
        spark, path, ckpt, CFG, buckets_per_job=2, max_jobs=1
    )
    done_after_kill = ckpt.completed_buckets(spark, "feature_matrix")
    assert 0 < len(done_after_kill) < 8
    assert partial.count() > 0

    # resume completes only the missing buckets
    full = extract_from_partitioned(spark, path, ckpt, CFG, buckets_per_job=2)
    assert ckpt.completed_buckets(spark, "feature_matrix") == set(range(8))

    want = _sorted_pdf(feature_matrix(ev, None, CFG))
    got = _sorted_pdf(full)
    assert list(want.columns) == list(got.columns)
    assert len(want) == len(got) > 0
    for c in want.columns:
        w, g = want[c], got[c]
        if w.dtype.kind == "f":
            assert (w - g).abs().max() < 1e-9, c
        else:
            assert w.tolist() == g.tolist(), c

    # lineage carries per-bucket row counts (A10 global counters)
    metrics = ckpt.stage_metrics(spark, "feature_matrix").toPandas()
    assert (metrics["status"] == "done").all()
    assert metrics["row_count"].sum() == len(got)


def test_resume_does_not_recompute(spark, part_events, tmp_path):
    """Second invocation with everything committed runs ZERO new jobs —
    lineage row count stays put."""
    path, _ = part_events
    ckpt = CheckpointManager(str(tmp_path / "ckpt2"), n_buckets=4)
    extract_from_partitioned(spark, path, ckpt, CFG)
    n_lineage = ckpt.lineage(spark).count()
    extract_from_partitioned(spark, path, ckpt, CFG)
    assert ckpt.lineage(spark).count() == n_lineage


def test_day_pruned_extraction(spark, part_events, tmp_path):
    """Extracting a day range only sees that range's events (the prune is
    at the partition level, so the matrix's bins cover a subset)."""
    path, _ = part_events
    days = [r[0] for r in spark.read.parquet(path).select("day").distinct().orderBy("day").collect()]
    if len(days) < 2:
        pytest.skip("synth span shorter than 2 days")
    ckpt = CheckpointManager(str(tmp_path / "ckpt3"), n_buckets=4)
    first = extract_from_partitioned(spark, path, ckpt, CFG, start_day=days[0], end_day=days[0])
    n_events_day0 = spark.read.parquet(path).filter(F.col("day") == days[0]).count()
    total_ann_wd = first.agg(
        F.sum("announcements") + F.sum("withdrawals")
    ).collect()[0][0]
    assert total_ann_wd == n_events_day0
