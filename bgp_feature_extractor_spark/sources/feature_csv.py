"""Feature-CSV round-trip + analysis accumulator (SURVEY §2.1 S6/S7/S9, §2.5 P7).

The reference's second pipeline (EP2) does not consume the extractor's
in-memory output — it re-reads the feature CSVs from disk
(``label_csv.py:228`` ``pd.read_csv(file, index_col=0)``), repairs any
missing pivot columns with zeros (``fix_columns``, ``label_csv.py:37-51``),
and at the end of every run appends that run's analysis/summary vectors into
persistent accumulator CSVs (``analysis.csv`` / ``anomalies_comparison.csv``,
``label_csv.py:362-381``: read-if-exists -> concat -> column-sort -> write).

Spark-first re-expression:
  * the CSV read is a ``spark.read.csv`` with an EXPLICIT schema (never
    inferSchema — at 100 TB schema inference is a full extra scan);
  * ``fix_columns`` is column arithmetic on the DataFrame, no data pass;
  * the accumulators are LONG-form tables (episode, metric, value) merged
    with unionByName + last-wins dedup, so re-running an episode is
    idempotent (the reference's pd.concat(axis=1) would duplicate the
    column instead — documented divergence). They hold one row per
    (episode, metric): KB-scale metadata, so the single-file CSV write is a
    deliberate driver-side coalesce, not a scan path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns, pivot_columns

# golden-layout value dtypes: everything is a counter (long) except the two
# true means and the reconstructed wall-clock timestamp
_DOUBLE_FEATURES = {"edit_distance_avg", "rare_ases_avg"}


def feature_csv_schema(cfg: EngineConfig | None = None, columns: list[str] | None = None) -> T.StructType:
    """Explicit schema for a reference-layout feature CSV. ``columns`` lets a
    caller describe a DEGRADED csv (missing pivot columns) — the fix-up adds
    them back after the read."""
    cfg = cfg or EngineConfig()
    columns = columns if columns is not None else ["bin"] + golden_columns(cfg)
    fields = []
    for c in columns:
        if c in _DOUBLE_FEATURES:
            t: T.DataType = T.DoubleType()
        elif c == "timestamp":
            t = T.TimestampType()
        elif c == "source":
            t = T.StringType()
        else:
            t = T.LongType()
        fields.append(T.StructField(c, t))
    return T.StructType(fields)


def fix_columns(df: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """Add any missing pivot columns as zero-filled longs
    (``label_csv.py:37-51``): edit_distance_dict_0..10,
    edit_distance_unique_dict_0..10, origin_0..2."""
    cfg = cfg or EngineConfig()
    present = set(df.columns)
    for c in pivot_columns(cfg):
        if c not in present:
            df = df.withColumn(c, F.lit(0).cast("long"))
    return df


def read_feature_csv(
    spark: SparkSession,
    path: str,
    cfg: EngineConfig | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """S6: read a feature CSV written by ``plans.feature_matrix
    .to_reference_csv`` (header, one directory per source via partitionBy)
    and return it in the golden column layout, pivot columns repaired.

    ``columns``: the physical column list of the CSV when it is a degraded
    external file (reference CSVs sometimes lack pivot keys that never
    occurred in that episode, ``label_csv.py:37``)."""
    cfg = cfg or EngineConfig()
    df = spark.read.csv(path, header=True, schema=feature_csv_schema(cfg, columns))
    # partitionBy("source") writes source as a directory key, not a column —
    # spark.read.csv recovers it as a partition column (string)
    if "source" not in df.columns:
        raise ValueError(f"{path}: partitioned source directories not found")
    df = fix_columns(df, cfg)
    return df.select("source", "bin", *golden_columns(cfg))


# ---------------------------------------------------------------------------
# S9: persistent analysis accumulators


def analysis_records(analysis: DataFrame, episode: str) -> DataFrame:
    """Melt ``plans.label_pipeline.analyze_dataset`` output into accumulator
    rows (episode, metric, value): one verdict string per
    (column, stat, before|after), keyed like the reference's
    ``{col}_{stat}_{ref}`` metric names with episode = ``{name}_{source}``
    (the reference keys by feature-file name, label_csv.py:236,162-163)."""
    pairs = []
    for stat in ("mean", "median"):
        for ref in ("before", "after"):
            pairs.append((stat, ref))
    melted = F.explode(
        F.map_from_arrays(
            F.array(*[F.concat(F.col("column"), F.lit(f"_{stat}_{ref}")) for stat, ref in pairs]),
            F.array(*[F.col(f"{stat}_verdict_{ref}") for stat, ref in pairs]),
        )
    ).alias("metric", "value")
    return analysis.select(
        F.concat(F.lit(episode + "_"), F.col("source")).alias("episode"), melted
    )


def summary_records(summary: DataFrame, episode: str) -> DataFrame:
    """Melt ``summarize_dataset`` output into (episode, metric, value) rows:
    ``{col}_mean`` / ``{col}_median`` numeric values rendered as strings
    (the accumulator holds heterogeneous episodes, label_csv.py:116-124)."""
    melted = F.explode(
        F.map_from_arrays(
            F.array(
                F.concat(F.col("column"), F.lit("_mean")),
                F.concat(F.col("column"), F.lit("_median")),
            ),
            F.array(F.col("mean").cast("string"), F.col("median").cast("string")),
        )
    ).alias("metric", "value")
    return summary.select(
        F.concat(F.lit(episode + "_"), F.col("source")).alias("episode"), melted
    )


_ACC_SCHEMA = T.StructType(
    [
        T.StructField("episode", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def accumulate(spark: SparkSession, records: DataFrame, path: str) -> DataFrame:
    """S9 read-union-write merge (label_csv.py:365-381): load the existing
    accumulator if present, merge this run's records (last-wins on
    (episode, metric)), sort, and atomically rewrite ``path`` as ONE csv
    file. Returns the merged DataFrame.

    The accumulator is bounded by #episodes x #metrics (metadata scale), so
    the single-file rewrite is O(KB) regardless of input data size."""
    new = records.select("episode", "metric", "value")
    if os.path.isfile(path):
        old = spark.read.csv(path, header=True, schema=_ACC_SCHEMA)
        # last-wins: keep the incoming row when the same (episode, metric)
        # is re-run — pd.concat(axis=1) would instead duplicate the column
        old = old.join(new.select("episode", "metric").distinct(), ["episode", "metric"], "left_anti")
        merged = old.unionByName(new)
    else:
        merged = new
    out = merged.orderBy("metric", "episode")
    pdf = out.toPandas()  # accumulator is metadata-sized by construction
    tmp = path + ".tmp"
    pdf.to_csv(tmp, index=False)
    os.replace(tmp, path)
    # return the MATERIALIZED merge — a lazy plan would re-read `path`,
    # which this call just replaced
    return spark.createDataFrame(pdf, _ACC_SCHEMA)


def to_wide_pandas(acc: DataFrame):
    """Reference-shaped view of an accumulator (metrics as the index,
    episodes as alphabetically-sorted columns — label_csv.py:377): for
    parity checks and human diffing."""
    pdf = acc.toPandas()
    wide = pdf.pivot(index="metric", columns="episode", values="value")
    return wide.reindex(sorted(wide.columns), axis=1)
