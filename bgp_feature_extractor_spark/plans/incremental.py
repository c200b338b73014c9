"""Resumable feature extraction over the partitioned event table — the
reference's operational workflow (discover day files -> extract -> resume
after a kill) composed from S1 (sources/partitioned.py) and S5
(sources/checkpoint.py).

Exactness: every feature-matrix key family starts with ``source`` (bins,
classification state, rare recurrences are all per-source), so hash-
bucketing the input BY SOURCE and extracting per bucket is byte-identical
to one full-span run — union(feature_matrix(bucket_i)) ==
feature_matrix(all). That is what makes partition-granular resume exact
rather than approximate; cross-source state does not exist in the
reference's data model (one process per collector/peer,
feature-extractor.py:52-57).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.sources.checkpoint import CheckpointManager
from bgp_feature_extractor_spark.sources.partitioned import read_events_pruned


def checkpointed_feature_matrix(
    events: DataFrame,
    ckpt: CheckpointManager,
    cfg: EngineConfig | None = None,
    snapshot: DataFrame | None = None,
    stage: str = "feature_matrix",
    **run_kwargs,
) -> DataFrame:
    """Run the feature matrix with per-source-bucket checkpoint/lineage.
    A killed job (simulated with ``max_jobs``) resumes from the lineage
    table and recomputes only missing buckets."""
    cfg = cfg or EngineConfig()
    return ckpt.run_stage(
        stage,
        events,
        lambda df: feature_matrix(df, snapshot, cfg),
        key_col="source",
        **run_kwargs,
    )


def extract_from_partitioned(
    spark: SparkSession,
    events_path: str,
    ckpt: CheckpointManager,
    cfg: EngineConfig | None = None,
    sources: list[str] | None = None,
    start_day: str | _dt.date | None = None,
    end_day: str | _dt.date | None = None,
    **run_kwargs,
) -> DataFrame:
    """S1 + S5 end to end: pruned scan of the (source, day)-partitioned
    table (PartitionFilters prune unselected collector-days at the file
    listing), then resumable bucket-granular extraction. ``day`` is a
    partition key only — it is dropped before extraction so the matrix
    schema matches the flat-scan path exactly."""
    ev = read_events_pruned(spark, events_path, sources, start_day, end_day).drop("day")
    return checkpointed_feature_matrix(ev, ckpt, cfg, **run_kwargs)
