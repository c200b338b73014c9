"""A5 bounded-memory fold (VERDICT r1 finding 2): the Q1 recurrence
v_k = L_k + floor(v_{k-1}/k) collapses to v_N = L_N once N > 2*max(L)+1,
so fold_bin_aggregates only collect_lists bins below that cutoff.

Tests: (a) the collapse claim itself against a brute-force fold across the
boundary, (b) fold_bin_aggregates == brute force on randomized bins around
the cutoff, (c) a hot bin (100k announcements in ONE bin) goes through the
formula branch and still matches the brute-force value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.operators.aggregates import fold_bin_aggregates
from tests.conftest import events_sdf


def brute_fold(lens: list[int]) -> int:
    v = 0
    for k, length in enumerate(lens, start=1):
        v = length + v // k
    return v


def test_collapse_claim_exhaustive():
    """For every (max_len, N) near the boundary, v_N == L_N whenever
    N > 2*max_len + 1 — the invariant the relational cutoff relies on."""
    rng = np.random.RandomState(0)
    for max_len in (1, 2, 3, 7, 15):
        for n in range(2 * max_len + 2, 2 * max_len + 40):
            for _ in range(20):
                lens = rng.randint(1, max_len + 1, size=n).tolist()
                lens[rng.randint(n)] = max_len  # ensure the max is realized
                assert brute_fold(lens) == lens[-1], (max_len, n, lens)


def _events_pdf(bins: dict[int, list[int]]) -> pd.DataFrame:
    """One source; bins -> list of announcement token lengths (in order)."""
    rows = []
    ts = 0
    for b in sorted(bins):
        for j, length in enumerate(bins[b]):
            rows.append(
                {
                    "source": "s0",
                    "doc_id": f"d{ts}",
                    # constant ts per bin: (ts, seq) order == list order
                    "ts": b * 60,
                    "seq": ts,
                    "kind": "ann",
                    "tokens": list(range(1, length + 1)),
                    "origin": 0,
                    "attrs_sig": None,
                }
            )
            ts += 1
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def fold_check(spark):
    def check(bins: dict[int, list[int]]):
        pdf = _events_pdf(bins)
        sdf = events_sdf(spark, pdf).withColumn("bin", (F.col("ts") / 60).cast("long"))
        got = {
            r["bin"]: r["as_path_avg"]
            for r in fold_bin_aggregates(sdf).collect()
        }
        want = {b: brute_fold(lens) for b, lens in bins.items()}
        assert got == want, f"got {got} want {want}"

    return check


def test_fold_matches_brute_force_around_cutoff(fold_check):
    rng = np.random.RandomState(42)
    bins = {}
    for b in range(25):
        max_len = int(rng.randint(1, 12))
        # sizes straddling the 2*max_len+1 cutoff
        n = int(rng.randint(1, 3 * max_len + 6))
        bins[b] = rng.randint(1, max_len + 1, size=n).tolist()
    fold_check(bins)


def test_hot_bin_uses_formula_branch(fold_check, spark):
    """100k announcements in one bin: the collect_list branch must not see
    this bin (left-semi on the small-keys set), and the formula answer is
    exact."""
    rng = np.random.RandomState(7)
    hot = rng.randint(1, 15, size=100_000).tolist()
    bins = {0: hot, 1: [3, 5, 2]}
    fold_check(bins)

    # plan-level: the fold aggregation input is filtered by a semi join
    pdf = _events_pdf({0: hot[:100]})
    sdf = events_sdf(spark, pdf).withColumn("bin", (F.col("ts") / 60).cast("long"))
    plan = fold_bin_aggregates(sdf)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan
