"""S6/S7/P7/S9: feature-CSV round-trip, fix_columns repair, and the
persistent analysis accumulator (reference label_csv.py:37-51,228,362-381;
feature-extractor.py:70-72)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
from bgp_feature_extractor_spark.oracle import make_anomaly_intervals, make_events_updates
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix, to_reference_csv
from bgp_feature_extractor_spark.plans.label_pipeline import (
    analyze_dataset,
    labeled_ratio_dataset,
    summarize_dataset,
)
from bgp_feature_extractor_spark.sources.feature_csv import (
    accumulate,
    analysis_records,
    feature_csv_schema,
    fix_columns,
    read_feature_csv,
    summary_records,
    to_wide_pandas,
)
from tests.conftest import events_sdf

CFG = EngineConfig()


@pytest.fixture(scope="module")
def matrix_and_intervals(spark):
    ev = make_events_updates(n_events=2500)
    m = feature_matrix(events_sdf(spark, ev), None, CFG).cache()
    iv = spark.createDataFrame(make_anomaly_intervals(ev))
    return m, iv


def _sorted_pdf(df):
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    return pdf.sort_values(["source", "bin"]).reset_index(drop=True)


def test_csv_round_trip_golden_layout(spark, matrix_and_intervals, tmp_path):
    """S7 write -> S6 read: byte-level parity of the 52-column matrix."""
    m, _ = matrix_and_intervals
    path = str(tmp_path / "features_csv")
    to_reference_csv(m, path, CFG)
    back = read_feature_csv(spark, path, CFG)
    assert back.columns == ["source", "bin"] + golden_columns(CFG)
    want, got = _sorted_pdf(m.select(*back.columns)), _sorted_pdf(back)
    assert len(want) == len(got) and len(want) > 0
    for c in want.columns:
        assert want[c].tolist() == got[c].tolist(), f"column {c} drifted through CSV"


def test_fix_columns_restores_missing_pivots(spark, matrix_and_intervals, tmp_path):
    """P7: a degraded CSV missing pivot columns reads back zero-padded
    (label_csv.py:37-51)."""
    m, _ = matrix_and_intervals
    dropped = ["edit_distance_dict_7", "edit_distance_unique_dict_3", "origin_2"]
    degraded = m.drop(*dropped)
    path = str(tmp_path / "degraded_csv")
    to_reference_csv(degraded, path, CFG)
    cols = ["bin"] + [c for c in golden_columns(CFG) if c not in dropped]
    back = read_feature_csv(spark, path, CFG, columns=cols)
    assert back.columns == ["source", "bin"] + golden_columns(CFG)
    for c in dropped:
        vals = back.select(c).distinct().collect()
        assert [r[0] for r in vals] == [0], f"{c} should be zero-filled"


def test_csv_round_trip_feeds_ep2(spark, matrix_and_intervals, tmp_path):
    """matrix -> CSV -> EP2 produces the same label_ratios output as the
    direct DF path (VERDICT item 6 done-condition)."""
    m, iv = matrix_and_intervals
    path = str(tmp_path / "ep2_csv")
    to_reference_csv(m, path, CFG)
    back = read_feature_csv(spark, path, CFG)
    direct = labeled_ratio_dataset(m, iv, CFG, pad=False)
    via_csv = labeled_ratio_dataset(back, iv, CFG, pad=False)
    want, got = _sorted_pdf(direct), _sorted_pdf(via_csv)
    assert list(want.columns) == list(got.columns)
    assert len(want) == len(got) > 0
    for c in want.columns:
        w, g = want[c], got[c]
        if w.dtype.kind == "f":
            assert (w - g).abs().max() < 1e-9, f"column {c} drifted"
        else:
            assert w.tolist() == g.tolist(), f"column {c} drifted"


def test_analysis_accumulator_merge(spark, matrix_and_intervals, tmp_path):
    """S9: read-union-write into analysis.csv — new episodes append as new
    columns of the wide view, columns stay sorted, re-runs are idempotent
    (label_csv.py:362-381)."""
    m, iv = matrix_and_intervals
    labeled = labeled_ratio_dataset(m, iv, CFG, pad=False)
    analysis = analyze_dataset(labeled, iv)
    path = str(tmp_path / "analysis.csv")

    acc1 = accumulate(spark, analysis_records(analysis, "slammer"), path)
    n1 = acc1.count()
    assert n1 > 0

    acc2 = accumulate(spark, analysis_records(analysis, "nimda"), path)
    assert acc2.count() == 2 * n1

    # idempotent re-run of an episode: no duplicate rows
    acc3 = accumulate(spark, analysis_records(analysis, "nimda"), path)
    assert acc3.count() == 2 * n1

    wide = to_wide_pandas(acc3)
    assert list(wide.columns) == sorted(wide.columns)
    assert any(col.startswith("slammer_") for col in wide.columns)
    assert any(col.startswith("nimda_") for col in wide.columns)
    # verdict vocabulary is the reference's (label_csv.py:184-205)
    vocab = {
        "pretty much the same", "slightly higher", "slightly lower",
        "higher", "lower", "much higher", "much lower", "",
    }
    vals = {v for v in wide.to_numpy().ravel() if isinstance(v, str)}
    assert vals <= vocab, f"unexpected verdicts: {vals - vocab}"


def test_summary_accumulator(spark, matrix_and_intervals, tmp_path):
    """S9 twin: anomalies_comparison.csv from summarize_dataset."""
    m, iv = matrix_and_intervals
    labeled = labeled_ratio_dataset(m, iv, CFG, pad=False)
    summary = summarize_dataset(labeled)
    path = str(tmp_path / "anomalies_comparison.csv")
    acc = accumulate(spark, summary_records(summary, "slammer"), path)
    pdf = acc.toPandas()
    assert (pdf["metric"].str.endswith("_mean") | pdf["metric"].str.endswith("_median")).all()
    # numeric payloads parse back
    assert pdf["value"].astype(float).notna().all()


def test_schema_is_explicit_no_inference(spark):
    sch = feature_csv_schema(CFG)
    assert [f.name for f in sch.fields] == ["bin"] + golden_columns(CFG)
    kinds = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert kinds["edit_distance_avg"] == "double"
    assert kinds["rare_ases_avg"] == "double"
    assert kinds["timestamp"] == "timestamp"
    assert kinds["announcements"] == "bigint"
