"""Vectorized rare-token kernel == dict-loop transliteration of the
reference control flow, across block boundaries (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from bgp_feature_extractor_spark.operators.rare import rare_counts_exact, rare_counts_loop


@pytest.mark.parametrize("block", [10, 37, 100])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_equals_loop(block, seed):
    rng = np.random.default_rng(seed)
    n = 557
    paths = [
        np.unique(rng.zipf(1.5, size=rng.integers(1, 12)) % 300) for _ in range(n)
    ]
    r_v, g_v = rare_counts_exact(paths, block=block, pctile=20.0)
    r_l, g_l = rare_counts_loop([list(p) for p in paths], block=block, pctile=20.0)
    np.testing.assert_array_equal(g_v, g_l)
    np.testing.assert_array_equal(r_v, r_l)


def test_empty_and_short_streams():
    r, g = rare_counts_exact([], block=10)
    assert len(r) == 0 and len(g) == 0
    paths = [np.array([1, 2])] * 5  # shorter than one block
    r, g = rare_counts_exact(paths, block=10)
    assert not g.any() and not r.any()
