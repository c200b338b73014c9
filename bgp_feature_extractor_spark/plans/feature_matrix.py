"""End-to-end feature-matrix pipeline (reference entry point EP1,
feature-extractor.py:26-72; SURVEY.md §3).

Physical shape (local[N] and cluster alike):
  scan events (+ snapshot union)
    -> window classify             # shuffle 1: hash by (source, doc_id)
    -> bin column                  # broadcast join of per-source first_ts
    -> Arrow Levenshtein UDF       # map-side, on the uniform partitions
    -> groupBy(source, bin)        # shuffle 2: partial+final hash agg
    -> rare per-bin aggregates     # side branch: SLIM projection shuffled by
                                   # source, per-bin partials broadcast back
    -> dense spine join + fill     # broadcasts only
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
from bgp_feature_extractor_spark.functions.editdist import with_edit_distance
from bgp_feature_extractor_spark.operators.aggregates import aggregate_bins
from bgp_feature_extractor_spark.operators.asof import EVENT_COLS, classify_window
from bgp_feature_extractor_spark.operators.binning import (
    dense_spine,
    first_ts_per_source,
    with_bin,
)
from bgp_feature_extractor_spark.operators.rare import (
    join_rare,
    rare_bin_aggregates,
    rare_bin_aggregates_block,
    rare_bin_aggregates_dist,
    rare_bin_aggregates_stream,
)


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
    # rare branch reads the RAW events (cheap pruned re-scan), not the
    # classifier output — otherwise the classify window executes twice
    raw_binned = with_bin(events.select(*EVENT_COLS), firsts, cfg)
    # slim=raw_binned: as_path_avg (collect_list fold) and nlri_ann (exact
    # distinct) move to their own slim pass over the raw branch so the
    # 50-column aggregate stays one whole-stage-codegen HashAggregate
    # (measured 16.9s -> ~5s at 8M rows; see operators/aggregates.py)
    per_bin = aggregate_bins(dist, cfg, slim=raw_binned)
    rare_mode = cfg.rare_mode
    sizes: list[tuple[str, int]] = []
    if rare_mode in ("auto", "exact"):
        # AQE-style driver decision from the cached per-source stats row set
        # (one row per source — plan metadata, NOT a data collect): the
        # exact kernel is per-source sequential, so a single source above
        # the threshold would straggle the stage / blow one task's memory
        # at scale — and the same rows feed the LPT packing plan below.
        sizes = [
            (r["source"], int(r["n_rows"]))
            for r in firsts.select("source", "n_rows").collect()
        ]
    if rare_mode == "auto":
        hottest = max((n for _, n in sizes), default=0)
        rare_mode = "exact" if hottest <= cfg.rare_auto_rows else "block"
    if rare_mode == "exact":
        # Arrow-streaming per-source kernel: one shuffle + zero-copy flat
        # token access; the hot source costs ~the raw numpy kernel and its
        # stage overlaps the independent classify/agg branch. Sources are
        # LPT-packed onto partitions from the stats rows (operators/packing)
        rare_pb = rare_bin_aggregates_stream(raw_binned, cfg, sizes=sizes)
    elif rare_mode == "dist":
        # fully-JVM-distributed twin (windows + relational thresholds) —
        # for inputs where ONE source's token stream exceeds worker memory
        rare_pb = rare_bin_aggregates_dist(raw_binned, cfg)
    elif rare_mode == "block":
        # salted + re-merged relaxation (thresholds frozen per shard):
        # fully parallel even on one 40%-hot source — the 10^12-row path
        rare_pb = rare_bin_aggregates_block(raw_binned, cfg)
    elif rare_mode == "fold":
        # single Python fold per source (reference process model);
        # bit-identical to 'exact', kept for small inputs / cross-checks
        rare_pb = rare_bin_aggregates(raw_binned, cfg)
    else:
        rare_pb = None
    per_bin = join_rare(per_bin, rare_pb)
    dense = dense_spine(per_bin, firsts, cfg)
    return dense.select("source", "bin", *golden_columns(cfg))


REFERENCE_TIMESCALES = (1, 5, 10, 15, 60, 120)


def multi_width_matrices(
    events: DataFrame,
    snapshot: DataFrame | None = None,
    cfg: EngineConfig | None = None,
    widths: tuple[int, ...] = REFERENCE_TIMESCALES,
) -> DataFrame:
    """The reference's full run matrix: one feature matrix per timebin width
    (label_csv.py:302 ``timescales = ['1','5','10','15','60','120']`` — the
    reference launches one OS process per width,
    scripts/slammer-features.sh). Here the widths are one unioned DataFrame
    with a ``minutes_window`` column, so ONE Spark action executes all six
    extractions as independent DAG branches sharing the event scan — no
    driver-side loop over actions, and a cluster overlaps the widths'
    stages instead of running six sequential jobs."""
    import dataclasses

    cfg = cfg or EngineConfig()
    out = None
    for w in widths:
        m = feature_matrix(events, snapshot, dataclasses.replace(cfg, minutes_window=w))
        m = m.select(F.lit(int(w)).alias("minutes_window"), "*")
        out = m if out is None else out.unionByName(m)
    return out


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
