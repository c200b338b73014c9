"""Anomaly-interval labeling (reference label_csv.py:53-61; SURVEY §2.4 J4).

The interval table is tiny (one row per (event, source)) — an explicit
broadcast range-join, so labeling adds zero shuffle to the matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_intervals(
    matrix: DataFrame,
    intervals: DataFrame,
    label_col: str = "class",
    ts_col: str = "timestamp2",
    keys: tuple[str, ...] = ("source",),
) -> DataFrame:
    """class = label if start_ts <= timestamp2 <= end_ts else 0.

    ``keys`` generalizes the join key beyond per-source intervals: the
    multi-width dataset labels on ("minutes_window", "source") so ONE
    broadcast join covers every width — width is data, not a plan branch.
    """
    iv = intervals.select(*keys, "start_ts", "end_ts", "label")
    out = matrix.drop(label_col).join(F.broadcast(iv), list(keys), "left")
    out = out.withColumn(
        label_col,
        F.when(
            F.col(ts_col).between(F.col("start_ts"), F.col("end_ts")),
            F.col("label"),
        ).otherwise(F.lit(0)),
    )
    return out.drop("start_ts", "end_ts", "label")


def period_bucket(ts_col, start, end):
    """before/during/after split (label_csv.py:129-131)."""
    return (
        F.when(ts_col < start, F.lit("before"))
        .when(ts_col <= end, F.lit("during"))
        .otherwise(F.lit("after"))
    )
