"""As-of classification — ordered-merge fold strategy.

The BASELINE north_star's prescribed physical shape: ``repartition(source,
doc_id)`` + ``sortWithinPartitions(source, doc_id, ts, seq)`` +
``mapInPandas`` ordered merge. Byte-identical results to
``operators/asof.classify_window`` (asserted in tests); exists because at
extreme scale a window over millions of tiny entity partitions can be
outperformed by a single partition-local streaming pass (no per-entity
window frame bookkeeping), and because it generalizes to stateful logic
that has no window-function closed form.

Entity groups can straddle Arrow batch boundaries inside a partition, so
the kernel carries the trailing (source, doc_id) run between batches.
State derivation is the vectorized closed form (cumulative counts + shifted
cummax indices), not a per-row state machine; only the attrs-map comparison
touches Python objects (map-typed payloads have no pandas vector form).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.operators.asof import (
    CLS_DUP,
    CLS_FLAP,
    CLS_IMP_DPATH,
    CLS_IMP_SPATH,
    CLS_NADA,
    CLS_NEW,
    CLS_UNKNOWN,
    CLS_WD,
    CLS_WD_DUP,
    CLASSIFIED_COLS,
    union_snapshot,
)

CLASSIFIED_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("origin", T.IntegerType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("uniq_len", T.IntegerType()),
        T.StructField("cls", T.StringType()),
        T.StructField("to_longer", T.BooleanType()),
        T.StructField("to_shorter", T.BooleanType()),
        T.StructField("origin_changed", T.BooleanType()),
        T.StructField("prev_tokens", T.ArrayType(T.IntegerType())),
    ]
)


def _aslist(x) -> list:
    """Arrow hands array<int> columns to pandas as np.ndarray (or None)."""
    return [] if x is None else list(x)


def _asdict(x) -> dict:
    """Arrow hands map<k,v> columns to pandas as list-of-(k,v) tuples."""
    if x is None:
        return {}
    return dict(x) if not isinstance(x, dict) else x


def _process(pdf: pd.DataFrame, cfg: EngineConfig) -> pd.DataFrame:
    n = len(pdf)
    pdf = pdf.reset_index(drop=True)
    kind = pdf["kind"].to_numpy()
    annlike = (kind == "ann") | (kind == "snap")
    is_wd = kind == "wd"
    grp = pdf.groupby(["source", "doc_id"], sort=False)

    ann_i = annlike.astype(np.int64)
    wd_i = is_wd.astype(np.int64)
    ann_cnt_before = grp.cumcount().to_numpy() * 0  # placeholder shape
    ann_cnt_before = (
        pd.Series(ann_i).groupby([pdf["source"], pdf["doc_id"]], sort=False).cumsum().to_numpy()
        - ann_i
    )
    wd_cnt_before = (
        pd.Series(wd_i).groupby([pdf["source"], pdf["doc_id"]], sort=False).cumsum().to_numpy()
        - wd_i
    )
    prev_kind = grp["kind"].shift(1).to_numpy()

    # index of the last ann-like row strictly before each row, within entity:
    # shift the own-ann index down one, then forward-fill per group (defined
    # values are strictly increasing, so ffill == running max)
    idx = np.arange(n, dtype=np.float64)
    own_ann_idx = pd.Series(np.where(annlike, idx, np.nan))
    shifted = own_ann_idx.groupby([pdf["source"], pdf["doc_id"]], sort=False).shift(1)
    last_ann_idx = (
        shifted.groupby([pdf["source"], pdf["doc_id"]], sort=False).ffill().to_numpy()
    )
    has_prev = ~np.isnan(last_ann_idx)
    prev_idx = np.where(has_prev, last_ann_idx, 0).astype(np.int64)

    tokens = pdf["tokens"].to_numpy(dtype=object)
    origin = pdf["origin"].to_numpy(dtype=object)
    sig = pdf["attrs_sig"].to_numpy(dtype=object)

    prev_tokens = np.where(has_prev, tokens[prev_idx], None)
    prev_origin = np.where(has_prev, origin[prev_idx], None)
    prev_sig = np.where(has_prev, sig[prev_idx], None)

    withdrawn_before = (prev_kind == "wd") | (
        ((prev_kind == "ann") | (prev_kind == "snap"))
        & (ann_cnt_before == 1)
        & (wd_cnt_before > 0)
    )
    known_before = has_prev

    # attr comparison (quirk Q6: unknown-prefixed keys always differ)
    unk = cfg.unknown_attr_prefix
    origin_diff = np.zeros(n, dtype=bool)
    path_diff = np.zeros(n, dtype=bool)
    any_diff = np.zeros(n, dtype=bool)
    count_mismatch = np.zeros(n, dtype=bool)
    cmp_rows = np.nonzero(known_before & (kind == "ann"))[0]
    for i in cmp_rows:
        od = origin[i] != prev_origin[i]
        ptd = _aslist(tokens[i]) != _aslist(prev_tokens[i])
        ns, os_ = _asdict(sig[i]), _asdict(prev_sig[i])
        sd = any(
            k.startswith(unk) or os_.get(k) != v for k, v in ns.items()
        )
        origin_diff[i] = od
        path_diff[i] = ptd
        any_diff[i] = od or ptd or sd
        count_mismatch[i] = len(ns) != len(os_)

    is_ann = kind == "ann"
    is_reann = is_ann & known_before & ~withdrawn_before
    is_new = is_ann & ~known_before & ~withdrawn_before
    is_nada_branch = is_ann & known_before & withdrawn_before

    cls = np.full(n, CLS_UNKNOWN, dtype=object)
    cls[is_wd & ~withdrawn_before] = CLS_WD
    cls[is_wd & withdrawn_before] = CLS_WD_DUP
    cls[is_new] = CLS_NEW
    imp = count_mismatch | any_diff
    cls[is_reann & ~imp] = CLS_DUP
    cls[is_reann & imp & path_diff] = CLS_IMP_DPATH
    cls[is_reann & imp & ~path_diff] = CLS_IMP_SPATH
    cls[is_nada_branch & any_diff] = CLS_NADA
    cls[is_nada_branch & ~any_diff] = CLS_FLAP

    compares = is_reann | is_nada_branch
    n_tok = np.array([len(t) if t is not None else -1 for t in tokens], dtype=np.int64)
    uniq_len = np.array(
        [len(set(t)) if t is not None else -1 for t in tokens], dtype=np.int64
    )
    prev_len = np.array(
        [len(t) if t is not None else -1 for t in prev_tokens], dtype=np.int64
    )

    out = pd.DataFrame(
        {
            "source": pdf["source"],
            "doc_id": pdf["doc_id"],
            "ts": pdf["ts"],
            "seq": pdf["seq"],
            "kind": pdf["kind"],
            "tokens": pdf["tokens"],
            "origin": pd.array(
                [None if o is None or (isinstance(o, float) and np.isnan(o)) else int(o) for o in origin],
                dtype="Int32",
            ),
            "n_tok": np.where(n_tok >= 0, n_tok, None),
            "uniq_len": np.where(uniq_len >= 0, uniq_len, None),
            "cls": cls,
            "to_longer": compares & (n_tok > prev_len),
            "to_shorter": compares & (n_tok >= 0) & (n_tok < prev_len),
            "origin_changed": compares & origin_diff,
            "prev_tokens": np.where(compares, prev_tokens, None),
        }
    )
    return out[kind != "snap"][CLASSIFIED_COLS]


def _fold_kernel(cfg: EngineConfig):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            key = pdf["source"].astype(str) + "\x00" + pdf["doc_id"].astype(str)
            tail_mask = (key == key.iloc[-1]).to_numpy()
            # rows are sorted by (source, doc_id), so the last entity is a
            # contiguous trailing run — hold it back for the next batch
            split = int(np.nonzero(~tail_mask)[0].max() + 1) if (~tail_mask).any() else 0
            head, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                yield _process(head, cfg)
        if carry is not None and len(carry):
            yield _process(carry, cfg)

    return kernel


def classify_fold(
    events: DataFrame,
    snapshot: DataFrame | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    cfg = cfg or EngineConfig()
    df = union_snapshot(events, snapshot)
    n = cfg.num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartition(n, "source", "doc_id").sortWithinPartitions(
        "source", "doc_id", "ts", "seq"
    )
    return part.mapInPandas(_fold_kernel(cfg), CLASSIFIED_SCHEMA)
