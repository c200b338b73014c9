"""Engine-vs-oracle allclose parity on the fixture event stream
(SURVEY.md §5.1) — every entity×bin feature vector must match the faithful
pandas port of the reference semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
from bgp_feature_extractor_spark.oracle import (
    ReferenceOracle,
    make_events_updates,
    make_rib_snapshot,
)
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from tests.conftest import events_sdf, snapshot_sdf

CFG = EngineConfig(minutes_window=1)


@pytest.fixture(scope="module")
def fixture_data():
    ev = make_events_updates(n_events=4000)
    snap = make_rib_snapshot(ev)
    return ev, snap


def _compare(got: pd.DataFrame, want: pd.DataFrame, cfg: EngineConfig):
    key = ["source", "bin"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert (got["source"].values == want["source"].values).all()
    assert (got["bin"].values == want["bin"].values).all()
    for col in golden_columns(cfg):
        g, w = got[col], want[col]
        if col == "timestamp":
            g = pd.to_datetime(g).astype("int64")
            w = pd.to_datetime(w).astype("int64")
        np.testing.assert_allclose(
            np.asarray(g, dtype=np.float64),
            np.asarray(w, dtype=np.float64),
            rtol=1e-9,
            atol=0,
            err_msg=f"column {col}",
        )


def _run(spark, ev, snap, cfg):
    got = feature_matrix(events_sdf(spark, ev), snapshot_sdf(spark, snap) if snap is not None else None, cfg).toPandas()
    want = ReferenceOracle(cfg).run(ev, snap)
    _compare(got, want, cfg)


def test_window_strategy_matches_oracle(spark, fixture_data):
    ev, snap = fixture_data
    _run(spark, ev, snap, CFG)


def test_without_snapshot(spark, fixture_data):
    ev, _ = fixture_data
    _run(spark, ev, None, CFG)


def test_wider_bins(spark, fixture_data):
    ev, snap = fixture_data
    _run(spark, ev, snap, EngineConfig(minutes_window=5))


def test_announcement_decomposition(spark, fixture_data):
    """Golden invariant (SURVEY.md §5): announcements = news + dups + imp_wd
    + nadas + flaps (+ unexported unknowns)."""
    ev, snap = fixture_data
    m = feature_matrix(events_sdf(spark, ev), snapshot_sdf(spark, snap), CFG).toPandas()
    leaves = m[["news", "dups", "imp_wd", "nadas", "flaps"]].sum(axis=1)
    assert (m["announcements"] >= leaves).all()
    # with a snapshot covering 70% of entities, most announcements classify
    assert leaves.sum() >= 0.95 * m["announcements"].sum()


def test_zero_temporal_leakage(spark, fixture_data):
    """Recompute with all events after a cutoff dropped: features for bins
    strictly before the cutoff bin must be unchanged (north_rule)."""
    ev, snap = fixture_data
    cut = int(ev["ts"].quantile(0.6))
    full = feature_matrix(events_sdf(spark, ev), snapshot_sdf(spark, snap), CFG).toPandas()
    trunc = feature_matrix(
        events_sdf(spark, ev[ev["ts"] < cut]), snapshot_sdf(spark, snap), CFG
    ).toPandas()
    for src, g in trunc.groupby("source"):
        cut_bin = (cut - ev[ev["source"] == src]["ts"].min()) // CFG.bin_size
        g = g[g["bin"] < cut_bin].sort_values("bin")
        f = full[(full["source"] == src) & (full["bin"] < cut_bin)].sort_values("bin")
        cols = [c for c in golden_columns(CFG) if c != "timestamp"]
        pd.testing.assert_frame_equal(
            g[cols].reset_index(drop=True), f[cols].reset_index(drop=True), check_dtype=False
        )
