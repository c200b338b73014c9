"""Per-bin feature aggregation — ONE groupBy(source, bin) for the whole
matrix (SURVEY.md §2.6 A1-A8; reference accumulators bgpmetrics_as.py:199-253).

Everything is a built-in aggregate expression (partial + final hash agg,
map-side combine for free). The two order-dependent quirks stay JVM-side:

  * A5 ``as_path_avg`` — Py2 floor-division recurrence over arrival order
    (bgpmetrics_as.py:635-636, quirk Q1):
        v_n = (len_n * n + v_{n-1}) // n  ==  len_n + v_{n-1} // n
    computed as F.aggregate over an array_sort'ed collect_list — a fold over
    (ts, seq)-ordered per-bin path lengths, no Python, no extra shuffle.
  * A6 ``unique_as_path_avg`` (bgpmetrics_as.py:637, quirk Q2) references the
    *running max*, which telescopes to a closed form over builtins:
        u_n = ulen_n + (ulen_n*n + max)//n - ulen_n = ulen_n + max_bin // n
    i.e. max_by(last path's unique length) + floor(max / count).

The pivot families (A7/A8) are conditional sums instead of ``.pivot()`` so
the whole matrix stays a single aggregate pass over the classified events
(pivot would re-shuffle; keys are clamped to <11 per bgpmetrics_as.py:176-185).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.operators.asof import (
    CLS_DUP,
    CLS_FLAP,
    CLS_IMP_DPATH,
    CLS_IMP_SPATH,
    CLS_NADA,
    CLS_NEW,
    CLS_WD_DUP,
)


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def aggregate_bins(classified: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """classified: output of classify_* + rare stage (rare_ct, rare_gated)
    + edit_dist column. Returns one row per (source, bin)."""
    cfg = cfg or EngineConfig()
    is_ann = F.col("kind") == "ann"
    is_wd = F.col("kind") == "wd"
    cls = F.col("cls")

    # A5 fold input: per-bin (ts, seq, n_tok) in arrival order
    path_entry = F.when(
        is_ann,
        F.struct(F.col("ts").alias("ts"), F.col("seq").alias("seq"), F.col("n_tok").alias("len")),
    )
    as_path_avg = F.aggregate(
        F.array_sort(F.collect_list(path_entry)),
        F.struct(F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("v")),
        lambda acc, x: F.struct(
            (acc["i"] + 1).alias("i"),
            (x["len"] + F.floor(acc["v"] / (acc["i"] + 1)).cast("long")).alias("v"),
        ),
        lambda acc: acc["v"],
    )

    n_paths = _cnt(is_ann)
    last_uniq = F.max_by(F.when(is_ann, F.col("uniq_len")), F.when(is_ann, F.struct("ts", "seq")))
    uniq_max = F.max(F.when(is_ann, F.col("uniq_len")))
    unique_as_path_avg = F.coalesce(
        last_uniq + F.floor(uniq_max / n_paths).cast("long"), F.lit(0)
    )

    aggs = [
        _cnt(is_ann).alias("announcements"),
        _cnt(is_wd).alias("withdrawals"),
        _cnt(cls == CLS_WD_DUP).alias("wd_dups"),
        _cnt(cls == CLS_NEW).alias("news"),
        _cnt(cls == CLS_DUP).alias("dups"),
        _cnt(cls == CLS_FLAP).alias("flaps"),
        _cnt(cls == CLS_NADA).alias("nadas"),
        _cnt(cls.isin(CLS_IMP_SPATH, CLS_IMP_DPATH)).alias("imp_wd"),
        _cnt(cls == CLS_IMP_SPATH).alias("imp_wd_spath"),
        _cnt(cls == CLS_IMP_DPATH).alias("imp_wd_dpath"),
        _cnt(F.col("to_longer")).alias("ann_to_longer"),
        _cnt(F.col("to_shorter")).alias("ann_to_shorter"),
        _cnt(F.col("origin_changed")).alias("origin_changes"),
        # A2 exact count-distinct of announced entities (bgpmetrics_as.py:398-399)
        F.count_distinct(F.when(is_ann, F.col("doc_id"))).alias("nlri_ann"),
        # A3 maxima (bgpmetrics_as.py:630-633); long-typed for oracle schema parity
        F.coalesce(F.max(F.when(is_ann, F.col("n_tok"))), F.lit(0)).cast("long").alias("as_path_max"),
        F.coalesce(uniq_max, F.lit(0)).cast("long").alias("unique_as_path_max"),
        as_path_avg.alias("as_path_avg"),
        unique_as_path_avg.alias("unique_as_path_avg"),
        # edit-distance family (bgpmetrics_as.py:640-664)
        F.coalesce(F.max("edit_dist"), F.lit(0)).cast("long").alias("edit_distance_max"),
        F.coalesce(F.avg("edit_dist"), F.lit(0.0)).alias("edit_distance_avg"),
        # rare family (Q5, bgpmetrics_as.py:614-628) is aggregated separately
        # on a slim projection and broadcast-joined back — see
        # operators/rare.rare_bin_aggregates / join_rare
    ]
    # A8 edit-distance histogram, keys clamped < pivot_limit (Q8 export rule)
    for k in range(cfg.pivot_limit):
        aggs.append(_cnt(F.col("edit_dist") == k).alias(f"edit_distance_dict_{k}"))
    # A7 per-message origin pivot (Q7), codes 0..2
    for code in cfg.origin_values:
        aggs.append(_cnt(is_ann & (F.col("origin") == code)).alias(f"origin_{code}"))

    out = classified.groupBy("source", "bin").agg(*aggs)
    # Q3: exported unique dict is a verbatim copy of the plain dict
    for k in range(cfg.pivot_limit):
        out = out.withColumn(f"edit_distance_unique_dict_{k}", F.col(f"edit_distance_dict_{k}"))
    out = out.withColumn("class", F.lit(0).cast("long"))
    return out
