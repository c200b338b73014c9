"""End-to-end feature-matrix pipeline (reference entry point EP1,
feature-extractor.py:26-72; SURVEY.md §3).

Physical shape (local[N] and cluster alike):
  scan events (+ snapshot union)
    -> window classify          # shuffle 1: hash by (source, doc_id)
    -> bin column               # broadcast join of per-source first_ts (no shuffle)
    -> rare fold                # shuffle 2: by source (exact mode)
    -> Arrow Levenshtein UDF    # map-side
    -> groupBy(source, bin)     # shuffle 3: tiny partial aggregates
    -> dense spine join + fill  # small
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
from bgp_feature_extractor_spark.functions.editdist import with_edit_distance
from bgp_feature_extractor_spark.operators.aggregates import aggregate_bins
from bgp_feature_extractor_spark.operators.asof import classify_window
from bgp_feature_extractor_spark.operators.binning import (
    dense_spine,
    first_ts_per_source,
    with_bin,
)
from bgp_feature_extractor_spark.operators.rare import rare_stage


def classify(events: DataFrame, snapshot: DataFrame | None, cfg: EngineConfig) -> DataFrame:
    if cfg.asof_strategy == "window":
        return classify_window(events, snapshot, cfg)
    if cfg.asof_strategy == "fold":
        from bgp_feature_extractor_spark.operators.asof_fold import classify_fold

        return classify_fold(events, snapshot, cfg)
    raise ValueError(f"unknown asof_strategy {cfg.asof_strategy!r}")


def feature_matrix(
    events: DataFrame,
    snapshot: DataFrame | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Wide row-per-(source, bin) matrix with the golden 52-column layout."""
    cfg = cfg or EngineConfig()
    # tiny (one row per source) but referenced three times (bin column,
    # spine, timestamp reconstruction) — cache so the events table is
    # scanned once for it, not thrice
    firsts = first_ts_per_source(events).cache()
    classified = classify(events, snapshot, cfg)
    binned = with_bin(classified, firsts, cfg)
    # edit distance BEFORE the per-source rare shuffle: here the data is
    # still hash-partitioned by (source, doc_id) so the Arrow UDF runs on
    # uniform partitions, and prev_tokens can be dropped before the skewed
    # rare exchange (hot sources shuffle ~40% less bytes)
    dist = with_edit_distance(binned, "tokens", "prev_tokens").drop("prev_tokens")
    rared = rare_stage(dist, cfg)
    per_bin = aggregate_bins(rared, cfg)
    dense = dense_spine(per_bin, firsts, cfg)
    return dense.select("source", "bin", *golden_columns(cfg))


def to_reference_csv(matrix: DataFrame, path: str, cfg: EngineConfig | None = None) -> None:
    """Reference CSV sink parity (feature-extractor.py:70-72): zero-filled,
    header, one directory per source via partitionBy."""
    cfg = cfg or EngineConfig()
    (
        matrix.na.fill(0)
        .repartition("source")
        .sortWithinPartitions("bin")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("source")
        .csv(path)
    )
