"""Hypothesis property tests for the two numpy kernels (no Spark):

* batch_levenshtein == the reference's pure-python DP
  (bgpmetrics_as.py:77-102 semantics: unit-cost edit distance) on random
  batches including None/empty rows;
* rare_counts_from_flat == rare_counts_loop (the dict-loop transliteration
  of the reference control flow) on random token streams across random
  block sizes — the vectorized decomposition (occurrence index /
  block-boundary thresholds / gate) must be exact for ANY stream, not
  just the fixture seeds in test_rare_kernel.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bgp_feature_extractor_spark.functions.editdist import batch_levenshtein
from bgp_feature_extractor_spark.operators.rare import (
    rare_counts_exact,
    rare_counts_loop,
)


def _ref_levenshtein(a, b):
    """Reference semantics: plain unit-cost DP (bgpmetrics_as.py:77-102)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1),
            )
        prev = cur
    return prev[n]


tok_list = st.lists(st.integers(min_value=0, max_value=9), max_size=12)
maybe_list = st.one_of(st.none(), tok_list)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(maybe_list, maybe_list), min_size=1, max_size=20))
def test_batch_levenshtein_matches_reference_dp(pairs):
    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    got = batch_levenshtein(a, b)
    for i, (x, y) in enumerate(pairs):
        if x is None or y is None:
            assert pd.isna(got.iloc[i])
        else:
            assert got.iloc[i] == _ref_levenshtein(x, y), (x, y)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=6), max_size=6), max_size=40
    ),
    st.integers(min_value=2, max_value=12),
)
def test_rare_kernel_matches_loop_transliteration(paths, block):
    # kernel contract: per-path UNIQUE tokens in arrival order
    upaths = [list(dict.fromkeys(p)) for p in paths]
    rare_v, gate_v = rare_counts_exact(
        [np.array(p, dtype=np.int64) for p in upaths], block=block, pctile=20.0
    )
    rare_l, gate_l = rare_counts_loop(upaths, block=block, pctile=20.0)
    np.testing.assert_array_equal(rare_v, rare_l)
    np.testing.assert_array_equal(gate_v, gate_l)
