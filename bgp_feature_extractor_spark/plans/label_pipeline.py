"""Dataset-generation pipeline (reference entry point EP2, label_csv.py:
preprocessing/analyze; SURVEY §3 EP2).

feature matrix -> interval label -> ratio projections -> drop pivot dicts
-> zero fill -> pad to batch multiple (+ optional seeded randomized clips,
annotated variant with label = max(announcements) per label_csv.py:262-273),
plus the before/during/after analysis aggregates (A11-A13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.operators.labeling import label_intervals, period_bucket
from bgp_feature_extractor_spark.operators.ratios import (
    add_ratio_columns,
    drop_edit_distance_columns,
    pad_to_batch_size,
)

# label_csv.py:106-110 analysis column set
ANALYSIS_COLUMNS = [
    "announcements",
    "withdrawals",
    "ratio_ann",
    "ratio_wd",
    "ratio_longer",
    "ratio_origin0",
    "ratio_origin2",
    "origin_changes",
    "ratio_dups",
    "ratio_flaps",
    "ratio_imp_wd",
    "ratio_nadas",
    "ratio_news",
    "ratio_imp_wd2",
    "ratio_exp_wd",
    "ratio_imp_wd_dpath",
    "ratio_imp_wd_spath",
    "edit_distance_avg",
    "as_path_avg",
    "rare_ases_avg",
    "number_rare_ases",
    "ratio_longer2",
    "ratio_shorter2",
    "ratio_shorter",
]


def labeled_ratio_dataset(
    matrix: DataFrame,
    intervals: DataFrame,
    cfg: EngineConfig | None = None,
    drop_dicts: bool = True,
    pad: bool = True,
    keys: tuple[str, ...] = ("source",),
) -> DataFrame:
    """The `ratios/dataset_*` variant (label_csv.py:245-250).

    ``keys``: interval-join key. Pass ("minutes_window", "source") to
    label a multi-width union in ONE plan instead of a per-width Python
    loop (the ratio projections are row-wise, so width never needs to be
    a separate plan branch)."""
    cfg = cfg or EngineConfig()
    out = label_intervals(matrix, intervals, keys=keys)
    out = add_ratio_columns(out)
    if drop_dicts:
        out = drop_edit_distance_columns(out)
    out = out.na.fill(0)
    if pad:
        out = pad_to_batch_size(out, cfg.batch_size, partition_cols=keys)
    return out


def annotated_dataset(
    matrix: DataFrame, intervals: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """`annotated/dataset_multi_*`: label value = max(announcements) per
    source (the 'mark', label_csv.py:262,273)."""
    marks = matrix.groupBy("source").agg(F.max("announcements").alias("label"))
    iv = intervals.drop("label").join(marks, "source")
    return labeled_ratio_dataset(matrix, iv, cfg)


def analyze_dataset(
    labeled: DataFrame, intervals: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Before/during/after mean+median per analysis column (A11), with the
    reference's verbal delta classification (label_csv.py:126-207).

    Returns one row per (source, column) with the six stats and four
    verdict strings."""
    columns = columns or ANALYSIS_COLUMNS
    iv = intervals.select("source", "start_ts", "end_ts")
    df = labeled.join(F.broadcast(iv), "source")
    df = df.withColumn(
        "_period", period_bucket(F.col("timestamp2"), F.col("start_ts"), F.col("end_ts"))
    )
    stacked = df.select(
        "source",
        "_period",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in columns]),
                F.array(*[F.col(c).cast("double") for c in columns]),
            )
        ).alias("column", "value"),
    )
    per = stacked.groupBy("source", "column").pivot(
        "_period", ["before", "during", "after"]
    ).agg(
        F.avg("value").alias("mean"), F.median("value").alias("median")
    )
    out = per
    for stat in ("mean", "median"):
        dur = F.col(f"during_{stat}")
        for ref in ("before", "after"):
            base = F.col(f"{ref}_{stat}")
            # rounded so epsilon-level float noise can't flip the verdict sign
            delta = F.round(F.when(base > 0, 1 - dur / base).otherwise(F.lit(1.0)), 9)
            out = out.withColumn(f"{stat}_delta_{ref}", delta)
        # verbal classification keyed off the BEFORE delta's sign
        # (label_csv.py:184: `signal` is computed once from delta_before)
        sign = F.when(F.col(f"{stat}_delta_before") < 0, F.lit("higher")).otherwise(
            F.lit("lower")
        )
        for ref in ("before", "after"):
            d = F.abs(F.col(f"{stat}_delta_{ref}"))
            out = out.withColumn(
                f"{stat}_verdict_{ref}",
                F.when(d < 0.1, F.lit("pretty much the same"))
                .when(d < 0.25, F.concat(F.lit("slightly "), sign))
                .when(d < 0.5, sign)
                .otherwise(F.concat(F.lit("much "), sign)),
            )
    return out


def summarize_dataset(labeled: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Whole-dataset mean+median per column (A12, label_csv.py:116-124)."""
    columns = columns or [c for c in ANALYSIS_COLUMNS if c not in ("announcements", "withdrawals")]
    stacked = labeled.select(
        "source",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in columns]),
                F.array(*[F.col(c).cast("double") for c in columns]),
            )
        ).alias("column", "value"),
    )
    return stacked.groupBy("source", "column").agg(
        F.avg("value").alias("mean"), F.median("value").alias("median")
    )
