"""Point-in-time (as-of) state lookup + event classification — window strategy.

The reference keeps a mutable RIB ``peer -> prefix -> attrs`` plus a
withdrawn flag and classifies each announcement against the most recent
prior state of its entity (SURVEY.md §2.4 J1/J2; lookups at
bgpmetrics_as.py:406,439,515, upserts at 441,469,499,516,539,561). That
mutable-state fold has a closed form over strictly-prior window frames,
so the default engine strategy is pure JVM window functions — no Python
in the hot path, whole-stage codegen end to end:

  * last-known attrs   = last(ann-struct, ignoreNulls) over (-inf, -1)
  * withdrawn flag     = derived from lag(kind) + cumulative ann/wd counts
    (proof: the flag is cleared by any announcement with known prior state
    and kept only by announcements with no prior state — which can only be
    the entity's first announcement — so "withdrawn before e" reduces to:
    previous event is a withdrawal, OR previous event is the entity's first
    announcement and a withdrawal preceded it with no snapshot seed)

Classification leaves C1-C13 (bgpmetrics_as.py:430-583) become one CASE
expression; quirk Q6 (unknown attr types always "different",
bgpmetrics_as.py:677-722) is an ``exists()`` over the attrs map.

Zero temporal leakage by construction: every frame is rowsBetween
(unboundedPreceding, -1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig

# classification labels
CLS_NEW = "new"
CLS_DUP = "dup"
CLS_IMP_SPATH = "imp_spath"
CLS_IMP_DPATH = "imp_dpath"
CLS_NADA = "nada"
CLS_FLAP = "flap"
CLS_UNKNOWN = "unknown"
CLS_WD = "wd"
CLS_WD_DUP = "wd_dup"

SNAPSHOT_TS = -(2**62)

EVENT_COLS = ["source", "doc_id", "ts", "seq", "kind", "tokens", "origin", "attrs_sig"]

CLASSIFIED_COLS = [
    "source",
    "doc_id",
    "ts",
    "seq",
    "kind",
    "tokens",
    "origin",
    "n_tok",
    "uniq_len",
    "cls",
    "to_longer",
    "to_shorter",
    "origin_changed",
    "prev_tokens",
]


def union_snapshot(events: DataFrame, snapshot: DataFrame | None) -> DataFrame:
    """Seed the as-of state: snapshot rows become announcements at ts=-inf
    (bgpmetrics_as.py:310-334 -> union at the logical-plan level, SURVEY §2.1 S3)."""
    ev = events.select(*EVENT_COLS)
    if snapshot is None:
        return ev
    snap = snapshot.select(
        "source",
        "doc_id",
        F.lit(SNAPSHOT_TS).cast("long").alias("ts"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("snap").alias("kind"),
        "tokens",
        "origin",
        "attrs_sig",
    )
    return ev.unionByName(snap)


def _sig_diff(cfg: EngineConfig, new_sig: Column, old_sig: Column) -> Column:
    """Any attr in the new message that is unknown-typed, absent from the old
    state, or value-changed (is_equal semantics, bgpmetrics_as.py:677-722)."""
    return F.exists(
        F.map_entries(F.coalesce(new_sig, F.expr("map()"))),
        lambda e: e["key"].startswith(cfg.unknown_attr_prefix)
        | ~F.coalesce(F.element_at(old_sig, e["key"]) == e["value"], F.lit(False)),
    )


def classify_window(
    events: DataFrame,
    snapshot: DataFrame | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Event-level classification via strictly-prior window frames.

    One shuffle: hash partition by (source, doc_id) for the window sort.
    At 100TB scale this is the unavoidable co-location shuffle for
    entity-ordered state; AQE coalesces the post-shuffle partitions.
    """
    cfg = cfg or EngineConfig()
    df = union_snapshot(events, snapshot)

    w = Window.partitionBy("source", "doc_id").orderBy("ts", "seq")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)

    is_annlike = F.col("kind").isin("ann", "snap")
    state = F.struct(
        F.col("tokens").alias("tokens"),
        F.col("origin").alias("origin"),
        F.coalesce(F.col("attrs_sig"), F.expr("map()")).alias("sig"),
    )
    # ONE select, not a withColumn chain: every withColumn re-analyzes the
    # whole plan server-side (a Py4J round-trip + analysis pass each)
    df = df.select(
        "*",
        F.last(F.when(is_annlike, state), ignorenulls=True).over(wprev).alias("prev_state"),
        F.lag("kind").over(w).alias("prev_kind"),
        F.count(F.when(is_annlike, F.lit(1))).over(wprev).alias("ann_cnt_before"),
        F.count(F.when(F.col("kind") == "wd", F.lit(1))).over(wprev).alias("wd_cnt_before"),
    )

    known_before = F.col("prev_state").isNotNull()
    withdrawn_before = (F.col("prev_kind") == "wd") | (
        F.col("prev_kind").isin("ann", "snap")
        & (F.col("ann_cnt_before") == 1)
        & (F.col("wd_cnt_before") > 0)
    )
    withdrawn_before = F.coalesce(withdrawn_before, F.lit(False))

    new_sig = F.coalesce(F.col("attrs_sig"), F.expr("map()"))
    old_sig = F.col("prev_state.sig")
    origin_diff = ~(F.col("origin").eqNullSafe(F.col("prev_state.origin")))
    path_diff = ~(F.col("tokens").eqNullSafe(F.col("prev_state.tokens")))
    any_diff = origin_diff | path_diff | _sig_diff(cfg, new_sig, old_sig)
    count_mismatch = F.size(new_sig) != F.size(old_sig)

    is_ann = F.col("kind") == "ann"
    is_reann = is_ann & known_before & ~withdrawn_before
    is_new = is_ann & ~known_before & ~withdrawn_before
    is_nada_branch = is_ann & known_before & withdrawn_before

    cls = (
        F.when(
            F.col("kind") == "wd",
            F.when(withdrawn_before, F.lit(CLS_WD_DUP)).otherwise(F.lit(CLS_WD)),
        )
        .when(
            is_reann,
            F.when(
                count_mismatch | any_diff,
                F.when(path_diff, F.lit(CLS_IMP_DPATH)).otherwise(F.lit(CLS_IMP_SPATH)),
            ).otherwise(F.lit(CLS_DUP)),
        )
        .when(is_new, F.lit(CLS_NEW))
        .when(is_nada_branch, F.when(any_diff, F.lit(CLS_NADA)).otherwise(F.lit(CLS_FLAP)))
        .otherwise(F.lit(CLS_UNKNOWN))
    )

    compares = is_reann | is_nada_branch  # branches that invoke is_equal / edit distance
    prev_len = F.size(F.col("prev_state.tokens"))
    n_tok = F.size("tokens")
    out = (
        df.select(
            "*",
            cls.alias("cls"),
            n_tok.alias("n_tok"),
            F.size(F.array_distinct("tokens")).alias("uniq_len"),
            (compares & (n_tok > prev_len)).alias("to_longer"),
            (compares & (n_tok < prev_len)).alias("to_shorter"),
            (compares & origin_diff).alias("origin_changed"),
            F.when(compares, F.col("prev_state.tokens")).alias("prev_tokens"),
        )
        .filter(F.col("kind") != "snap")
        .select(*CLASSIFIED_COLS)
    )
    return out
