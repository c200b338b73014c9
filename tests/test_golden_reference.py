"""End-to-end EP2 parity against REAL reference artifacts (VERDICT r2 #7).

Reads the reference's shipped golden feature matrix
``/root/reference/datasets/features-slammer-rrc04-513-1.csv`` (7200 x 52,
written by feature-extractor.py) through the engine's CSV source path
(explicit schema + fix_columns), applies the engine's interval labeling
(operators/labeling.label_intervals) with the reference's published
slammer window (label_csv.py:316: start=1043472590, end=1043540404,
label=1), and compares the result column-by-column against the shipped
labeled dataset ``datasets/dataset_slammer_513_1_rrc04.csv`` — which the
reference produced from the same features file via fix_columns +
add_label (verified equal-allclose on every non-class column).

Also checks the engine's 19 ratio projections (operators/ratios,
reference label_csv.py:64-98) against the reference formulas evaluated
in pandas on the same real data — div-by-zero => 0 semantics included.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
from bgp_feature_extractor_spark.operators.labeling import label_intervals
from bgp_feature_extractor_spark.operators.ratios import RATIO_DEFS, add_ratio_columns
from bgp_feature_extractor_spark.sources.feature_csv import (
    feature_csv_schema,
    fix_columns,
)

REF = "/root/reference/datasets"
FEATURES = f"{REF}/features-slammer-rrc04-513-1.csv"
DATASET = f"{REF}/dataset_slammer_513_1_rrc04.csv"
SLAMMER = ("rrc04-513", 1043472590, 1043540404, 1)  # label_csv.py:316
CFG = EngineConfig(minutes_window=1)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FEATURES) and os.path.exists(DATASET)),
    reason="reference golden CSVs not present",
)


@pytest.fixture(scope="module")
def labeled(spark):
    # the raw reference artifact: unnamed index column (the bin index),
    # then the 51 golden columns in alphabetical order — no source dirs
    schema = feature_csv_schema(CFG, ["bin"] + golden_columns(CFG))
    df = (
        spark.read.csv(FEATURES, header=True, schema=schema)
        .withColumn("source", F.lit(SLAMMER[0]))
    )
    df = fix_columns(df, CFG)
    iv = spark.createDataFrame(
        [SLAMMER], ["source", "start_ts", "end_ts", "label"]
    )
    return label_intervals(df, iv).orderBy("bin").toPandas()


@pytest.fixture(scope="module")
def golden():
    d = pd.read_csv(DATASET, index_col=0, quoting=3)
    d.index.name = "bin"
    return d.reset_index()


def test_golden_labeled_dataset_parity(labeled, golden):
    assert len(labeled) == len(golden) == 7200
    # class is the column the labeling pipeline produces: exact match
    np.testing.assert_array_equal(
        labeled["class"].to_numpy(), golden["class"].to_numpy()
    )
    assert int(labeled["class"].sum()) == 1130  # anomaly bins in the window
    # every other feature column must round-trip the CSV source allclose
    for c in golden.columns:
        if c in ("class", "timestamp"):
            continue
        np.testing.assert_allclose(
            labeled[c].to_numpy(dtype=float),
            golden[c].to_numpy(dtype=float),
            rtol=1e-9,
            atol=0,
            err_msg=c,
        )
    # timestamp (datetime string) survives the typed read
    assert str(labeled["timestamp"].iloc[0]) == golden["timestamp"].iloc[0]


def test_golden_ratio_columns_match_reference_formulas(spark, labeled):
    got = add_ratio_columns(
        spark.createDataFrame(labeled.drop(columns=["timestamp"]))
    ).toPandas()
    f = labeled  # reference formulas (label_csv.py:64-98), pandas-evaluated
    ann, wd = f["announcements"], f["withdrawals"]
    origins = f["origin_0"] + f["origin_1"] + f["origin_2"]
    n_wd = f["imp_wd"] + f["withdrawals"]
    longer2 = f["ann_to_longer"] + f["ann_to_shorter"]
    want = {
        "ratio_ann": ann / (ann + wd),
        "ratio_wd": wd / (ann + wd),
        "ratio_origin0": f["origin_0"] / origins,
        "ratio_origin1": f["origin_1"] / origins,
        "ratio_origin2": f["origin_2"] / origins,
        "ratio_dups": f["dups"] / ann,
        "ratio_flaps": f["flaps"] / ann,
        "ratio_imp_wd": f["imp_wd"] / ann,
        "ratio_nadas": f["nadas"] / ann,
        "ratio_news": f["news"] / ann,
        "ratio_longer": f["ann_to_longer"] / ann,
        "ratio_shorter": f["ann_to_shorter"] / ann,
        "ratio_longer2": f["ann_to_longer"] / longer2,
        "ratio_shorter2": f["ann_to_shorter"] / longer2,
        "ratio_imp_wd2": f["imp_wd"] / n_wd,
        "ratio_exp_wd": wd / n_wd,
        "ratio_wd_dups": f["wd_dups"] / wd,
        "ratio_imp_wd_dpath": f["imp_wd_dpath"] / f["imp_wd"],
        "ratio_imp_wd_spath": f["imp_wd_spath"] / f["imp_wd"],
    }
    assert set(want) == {name for name, _, _ in RATIO_DEFS}
    for name, series in want.items():
        ref = series.replace([np.inf, -np.inf], 0).fillna(0).to_numpy()
        np.testing.assert_allclose(
            got.sort_values("bin")[name].to_numpy(), ref, rtol=1e-9, atol=0,
            err_msg=name,
        )
