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
