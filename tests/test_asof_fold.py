"""Fold strategy == window strategy == oracle, plus full-pipeline parity
with asof_strategy='fold'."""

from __future__ import annotations

import pytest

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.oracle import make_events_updates, make_rib_snapshot
from bgp_feature_extractor_spark.operators.asof import CLASSIFIED_COLS, classify_window
from bgp_feature_extractor_spark.operators.asof_fold import classify_fold
from tests.conftest import events_sdf, snapshot_sdf


@pytest.fixture(scope="module")
def fixture_data():
    ev = make_events_updates(n_events=3000)
    return ev, make_rib_snapshot(ev)


def _canon(df):
    pdf = df.toPandas().sort_values(["source", "doc_id", "ts", "seq"]).reset_index(drop=True)
    for c in ("tokens", "prev_tokens"):
        pdf[c] = pdf[c].map(lambda t: None if t is None else tuple(t))
    return pdf.fillna({"origin": -1, "n_tok": -1, "uniq_len": -1})


def test_fold_equals_window(spark, fixture_data):
    ev, snap = fixture_data
    cfg = EngineConfig()
    sev, ssnap = events_sdf(spark, ev), snapshot_sdf(spark, snap)
    w = _canon(classify_window(sev, ssnap, cfg))
    f = _canon(classify_fold(sev, ssnap, cfg))
    assert len(w) == len(f)
    for c in CLASSIFIED_COLS:
        mism = (w[c].astype(object) != f[c].astype(object))
        # NaN prev_tokens handling: both None counts as equal
        bad = [i for i in mism[mism].index if not (w[c][i] is None and f[c][i] is None)]
        assert not bad, f"{c}: {[(i, w[c][i], f[c][i]) for i in bad[:5]]}"


def test_fold_small_batches(spark, fixture_data):
    """Entity runs straddling Arrow batches must be stitched correctly."""
    ev, snap = fixture_data
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        cfg = EngineConfig(num_partitions=3)
        sev, ssnap = events_sdf(spark, ev), snapshot_sdf(spark, snap)
        w = _canon(classify_window(sev, ssnap, cfg))
        f = _canon(classify_fold(sev, ssnap, cfg))
        assert (w["cls"].to_numpy() == f["cls"].to_numpy()).all()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def test_fold_pipeline_matches_oracle(spark, fixture_data):
    from bgp_feature_extractor_spark.oracle import ReferenceOracle
    from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
    from tests.test_feature_matrix_parity import _compare

    ev, snap = fixture_data
    cfg = EngineConfig(asof_strategy="fold")
    got = feature_matrix(events_sdf(spark, ev), snapshot_sdf(spark, snap), cfg).toPandas()
    want = ReferenceOracle(cfg).run(ev, snap)
    _compare(got, want, cfg)
