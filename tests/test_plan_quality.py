"""Plan-shape regression tests: the physical plans we rely on at 100TB
(pushdown, pruning, no accidental cartesian joins) must not silently
degrade when operators change. Complements PLANS.md (human review)."""

from __future__ import annotations

import pytest

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.sources.synth import synth_events


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "events.parquet")
    synth_events(spark, 2_000).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_feature_matrix_no_cartesian(events_parquet):
    plan = _plan(feature_matrix(events_parquet, None, EngineConfig()))
    assert "CartesianProduct" not in plan


def test_first_ts_scan_prunes_columns(spark, events_parquet):
    """The per-source first-ts aggregate must read only (source, ts) from
    parquet — a scan pulling tokens/attrs for a 2-column aggregate would
    be a 100TB-scale bug."""
    from bgp_feature_extractor_spark.operators.binning import first_ts_per_source

    plan = first_ts_per_source(events_parquet)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "tokens" not in read and "attrs_sig" not in read


def test_iceberg_fallback_roundtrip(spark, tmp_path):
    from bgp_feature_extractor_spark.sources.iceberg import (
        iceberg_available,
        read_table,
        write_table,
    )

    assert iceberg_available(spark) is False  # no runtime jar in this image
    df = synth_events(spark, 100)
    target = str(tmp_path / "tbl")
    kind = write_table(df, target, partition_by=["source"])
    assert kind == "parquet"
    back = read_table(spark, target)
    assert back.count() == 100
    assert set(back.columns) == set(df.columns)


def test_rare_auto_mode_switches_plan(spark, events_parquet):
    """'auto' rare mode (the default) must pick the per-source-sequential
    exact kernel for small sources and the fully-parallel salted 'block'
    path once ONE source crosses rare_auto_rows — without any caller flag.
    'block' is identifiable by its applyInPandas re-merge stage
    (FlatMapGroupsInPandas); 'exact' has none."""
    import dataclasses

    small_thr = dataclasses.replace(EngineConfig(), rare_mode="auto", rare_auto_rows=10)
    big_thr = dataclasses.replace(EngineConfig(), rare_mode="auto", rare_auto_rows=10**9)

    plan_block = _plan(feature_matrix(events_parquet, None, small_thr))
    plan_exact = _plan(feature_matrix(events_parquet, None, big_thr))
    assert "FlatMapGroupsInPandas" in plan_block, "auto did not escalate to block"
    assert "FlatMapGroupsInPandas" not in plan_exact, "auto did not stay exact"


def test_rare_auto_block_values_match_exact_below_shard(spark, events_parquet):
    """Below one shard (rare_shard_paths) the block relaxation is
    value-identical to exact — so the auto switch cannot silently change
    results at the scale where both run in tests."""
    import dataclasses

    from pyspark.sql import functions as F

    exact = feature_matrix(
        events_parquet, None, dataclasses.replace(EngineConfig(), rare_mode="exact")
    )
    auto_block = feature_matrix(
        events_parquet,
        None,
        dataclasses.replace(EngineConfig(), rare_mode="auto", rare_auto_rows=10),
    )
    cols = ["source", "bin", "number_rare_ases", "rare_ases_max", "rare_ases_avg"]
    a = exact.select(cols).orderBy("source", "bin").toPandas()
    b = auto_block.select(cols).orderBy("source", "bin").toPandas()
    assert a.equals(b)
