"""Multimodal plumbing: schema, batch shape, deterministic fake decode,
frame sampling; the real decoder must raise the documented stub error."""

from __future__ import annotations

import pytest

from bgp_feature_extractor_spark.operators.multimodal import (
    DecodeUnavailable,
    extract_media_features,
    fake_decode,
    frame_sample,
    real_decode,
    synth_media,
)


def test_extract_features_deterministic(spark):
    media = synth_media(spark, n=60)
    out = extract_media_features(media).orderBy("media_id").collect()
    assert len(out) == 60
    assert all(len(r["feature"]) == 8 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["feature"])
    again = extract_media_features(synth_media(spark, n=60)).orderBy("media_id").collect()
    assert [r["sha256"] for r in out] == [r["sha256"] for r in again]
    assert [r["feature"] for r in out] == [r["feature"] for r in again]


def test_real_decode_is_stubbed():
    with pytest.raises(DecodeUnavailable):
        real_decode(b"\x89PNG", "image", None)


def test_fake_decode_shape():
    v = fake_decode(b"abc", "audio", None)
    assert v.shape == (8,) and v.dtype.name == "float32"


def test_frame_sampling(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_n=10).collect()
    # videos have n_frames=30 -> frames 0,10,20
    vids = {r["media_id"] for r in frames}
    assert all(r["frame_idx"] in (0, 10, 20) for r in frames)
    assert len(frames) == 3 * len(vids)


def test_resize_images(spark):
    from bgp_feature_extractor_spark.operators.multimodal import (
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 30)
    out = resize_images(media, width=4, height=3).toPandas()
    # only image rows survive; every output is a 4x3 flat grid
    assert len(out) == 10
    assert (out["width"] == 4).all() and (out["height"] == 3).all()
    assert out["pixels"].map(len).eq(12).all()
    # deterministic across runs
    out2 = resize_images(media, width=4, height=3).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["pixels"].map(tuple) == b["pixels"].map(tuple)).all()
