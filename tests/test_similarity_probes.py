"""Multi-probe LSH bucket sequence (pure python — no Spark)."""

def test_probe_buckets_ordering_and_shape():
    # pure-python multi-probe: exact bucket first, then Hamming-1 flips of
    # the smallest-|margin| planes, ascending
    from bgp_feature_extractor_spark.operators.similarity import (
        hyperplane_margins_py,
        probe_buckets_py,
    )

    vec = [0.1 * i - 0.3 for i in range(16)]
    bucket, margins = hyperplane_margins_py(vec, n_planes=8)
    probes = probe_buckets_py(vec, n_planes=8, probes=4)
    assert probes[0] == bucket
    assert len(probes) == 4 and len(set(probes)) == 4
    order = sorted(range(8), key=lambda i: margins[i])
    for rank, b in enumerate(probes[1:]):
        flipped = (b ^ bucket).bit_length() - 1
        assert b == bucket ^ (1 << flipped)
        assert flipped == order[rank]  # ascending-margin flip order
    # probes=1 degenerates to the single exact bucket
    assert probe_buckets_py(vec, n_planes=8, probes=1) == [bucket]
