"""Multimodal plumbing: schemas, mapInPandas batch shape, 1-to-N frame
expansion, deterministic fake codec, stubbed real codec."""

from __future__ import annotations

import numpy as np
import pytest

from vector_database_api_spark.operators import multimodal as MM


def _media(spark):
    rows = [
        ("m1", "image", bytes([1, 2, 3, 4]) * 100, {"w": "64"}),
        ("m2", "image", bytes([9, 9, 9]) * 50, {"w": "32"}),
        ("m3", "video", bytes(range(256)) * 20, {"fps": "30"}),
        ("m4", "audio", bytes([7]) * 2048, {"sr": "16000"}),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark):
    media = _media(spark)
    out = MM.extract_features(media).collect()
    assert len(out) == 4
    by_id = {r["id"]: r for r in out}
    assert all(len(r["feature"]) == 32 for r in out)
    # deterministic: same bytes -> same feature across runs
    again = {r["id"]: r for r in MM.extract_features(media).collect()}
    assert by_id["m1"]["feature"] == again["m1"]["feature"]
    assert by_id["m1"]["feature"] != by_id["m2"]["feature"]


def test_frame_sampling_expansion(spark):
    media = _media(spark)
    frames = MM.sample_frames(media, every_n_bytes=1024, max_frames=8).collect()
    # only the video row expands; 256*20=5120 bytes -> 5 frames
    assert {r["id"] for r in frames} == {"m3"}
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0,
        1,
        2,
        3,
        4,
    ]
    assert all(len(bytes(r["frame"])) == 1024 for r in frames)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG...")


def test_fake_codec_stable():
    a = MM.fake_decode(b"abc")
    b = MM.fake_decode(b"abc")
    c = MM.fake_decode(b"abd")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.dtype == np.float32 and a.shape == (32,)
