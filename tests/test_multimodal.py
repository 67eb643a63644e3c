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


def test_only_native_codec_formats_are_stubbed():
    """PNG is now decoded for real (see the codec tests below); the
    NotImplementedError seam is scoped to formats that genuinely need a
    native library (JPEG)."""
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\xff\xd8\xff\xe0jpeg")
    with pytest.raises(ValueError):  # malformed PNG fails loudly, not silently
        MM.decode_image(b"\x89PNG\r\n\x1a\n" + b"junk")


def test_fake_codec_stable():
    a = MM.fake_decode(b"abc")
    b = MM.fake_decode(b"abc")
    c = MM.fake_decode(b"abd")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.dtype == np.float32 and a.shape == (32,)


def test_raw_gray_roundtrip():
    import numpy as np

    from vector_database_api_spark.operators.multimodal import (
        decode_raw_gray,
        encode_raw_gray,
    )

    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert (decode_raw_gray(encode_raw_gray(arr)) == arr).all()


def test_raw_gray_corrupt_raises():
    import pytest as _pytest

    from vector_database_api_spark.operators.multimodal import decode_raw_gray

    with _pytest.raises(ValueError, match="header"):
        decode_raw_gray(b"\x00")
    with _pytest.raises(ValueError, match="pixels"):
        decode_raw_gray(b"\x00\x02\x00\x02abc")  # 2x2 declared, 3 bytes


def test_resize_nearest_exact():
    import numpy as np

    from vector_database_api_spark.operators.multimodal import resize_nearest

    arr = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = resize_nearest(arr, 4, 4)
    assert (
        up
        == np.array(
            [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
            dtype=np.uint8,
        )
    ).all()
    down = resize_nearest(up, 2, 2)
    assert (down == arr).all()


def test_raw_gray_feature_pipeline(spark, sf_dir):
    import numpy as np

    from vector_database_api_spark.operators.multimodal import (
        decode_raw_gray,
        media_raw_gray_from_documents,
        raw_gray_features,
        resize_nearest,
    )
    from vector_database_api_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = media_raw_gray_from_documents(docs)
    feats = raw_gray_features(media).collect()
    assert len(feats) == 50

    # spot-check one row end-to-end against local numpy
    row = media.filter("id = '1'").collect()[0]
    img = decode_raw_gray(bytes(row["content"]))
    small = resize_nearest(img, 16, 16).astype(np.float64)
    got = [f for f in feats if f["id"] == "1"][0]
    assert got["h"] == img.shape[0] and got["w"] == img.shape[1]
    assert got["mean_px"] == pytest.approx(float(small.mean()))
    assert got["std_px"] == pytest.approx(float(small.std()))


def test_raw_pcm16_roundtrip():
    import numpy as np

    from vector_database_api_spark.operators.multimodal import (
        decode_raw_pcm16,
        encode_raw_pcm16,
    )

    s = np.array([0, -32768, 32767, 256, -97], dtype=np.int16)
    sr, back = decode_raw_pcm16(encode_raw_pcm16(16000, s))
    assert sr == 16000 and np.array_equal(back, s)


def test_raw_pcm16_truncation_raises():
    import numpy as np
    import pytest

    from vector_database_api_spark.operators.multimodal import (
        decode_raw_pcm16,
        encode_raw_pcm16,
    )

    blob = encode_raw_pcm16(8000, np.array([1, 2, 3], dtype=np.int16))
    with pytest.raises(ValueError, match="sample bytes"):
        decode_raw_pcm16(blob[:-1])
    with pytest.raises(ValueError, match="header"):
        decode_raw_pcm16(b"\x00")


def test_raw_pcm_features_hand_computed(spark):
    """Known 4-sample signal: rms, peak, and zero crossings by hand."""
    import math

    import numpy as np

    from vector_database_api_spark.operators.multimodal import (
        encode_raw_pcm16,
        raw_pcm_features,
    )

    s = np.array([256, -256, 512, 0], dtype=np.int16)  # 3 sign flips: + - + +(0 is >=0)
    media = spark.createDataFrame(
        [("a", "audio", bytearray(encode_raw_pcm16(8000, s)), {})],
        "id string, modality string, content binary, meta map<string,string>",
    )
    row = raw_pcm_features(media).collect()[0]
    assert row["sample_rate"] == 8000 and row["n_samples"] == 4
    assert row["duration_ms"] == 4 * 1000.0 / 8000
    assert row["peak"] == 512
    assert row["n_zero_cross"] == 2  # + -> - -> + -> + (0 counts as >= 0)
    want_rms = math.sqrt((256**2 + 256**2 + 512**2 + 0) / 4)
    assert abs(row["rms"] - want_rms) < 1e-12


# ---------------------------------------------------------------------------
# Real external-format codecs (pure Python + stdlib zlib)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np
    from vector_database_api_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    for shape in [(5, 7), (16, 16), (9, 3, 3), (4, 6, 4), (1, 1), (2, 300, 3)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for fm in [0, 1, 2, 3, 4, "mixed"]:
            b = mm.decode_png(mm.encode_png(a, fm))
            assert b.shape == a.shape and (b == a).all(), (shape, fm)


def test_png_corrupt_raises():
    import numpy as np
    import pytest as _pytest
    from vector_database_api_spark.operators import multimodal as mm

    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    png = mm.encode_png(g, "mixed")
    for cut in (len(png) // 2, 20, 9):
        with _pytest.raises(ValueError):
            mm.decode_png(png[:cut])
    with _pytest.raises(ValueError):
        mm.decode_png(b"notapng" + bytes(64))


def test_pnm_and_bmp_decode():
    import struct
    import numpy as np
    from vector_database_api_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    assert (mm.decode_pnm(b"P5\n# c\n9 6\n255\n" + g.tobytes()) == g).all()
    c = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    assert (mm.decode_pnm(b"P6 5 4 255\n" + c.tobytes()) == c).all()

    h, w = 3, 3
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        img[y][:, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )
    assert (mm.decode_bmp(bmp) == img).all()


def test_decode_image_dispatch():
    import numpy as np
    import pytest as _pytest
    from vector_database_api_spark.operators import multimodal as mm

    g = np.arange(30, dtype=np.uint8).reshape(5, 6)
    assert (mm.decode_image(mm.encode_png(g)) == g).all()
    assert (mm.decode_image(b"P5 6 5 255\n" + g.tobytes()) == g).all()
    assert (mm.decode_image(mm.encode_raw_gray(g)) == g).all()
    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0jpegdata")


def test_image_pixel_stats_on_png(spark):
    """The mapInPandas stats stage over real PNG content: exact integer
    stats equal the numpy ground truth."""
    import numpy as np
    from pyspark.sql import functions as F
    from vector_database_api_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    imgs = {str(i): rng.integers(0, 256, size=(8 + i, 9), dtype=np.uint8) for i in range(4)}
    rows = [
        (k, "image", bytearray(mm.encode_png(v, "mixed")), {"format": "png"})
        for k, v in imgs.items()
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["id"]: r for r in mm.image_pixel_stats(media).collect()}
    for k, v in imgs.items():
        r = got[k]
        assert (r["h"], r["w"]) == v.shape
        assert r["n_px"] == v.size
        assert r["sum_px"] == int(v.astype(np.int64).sum())
        assert r["min_px"] == int(v.min()) and r["max_px"] == int(v.max())


def test_png_roundtrip_oracle_parity_on_non_ascii(spark, tmp_path):
    """The png-roundtrip oracle equivalence must not depend on an
    ASCII-only corpus: both sides fold non-ASCII codepoints to '?'
    char-wise (Spark: encode('ascii','replace'); SQL: codepoint>=128 ->
    63), so a corpus with accents/CJK/emoji still value-matches."""
    import duckdb
    import pandas as pd

    from vector_database_api_spark import queries as q

    rows = [
        (0, "héllo wörld ünïcode"),
        (1, "日本語のテキスト here"),
        (2, "emoji 🚀 and plain ascii"),
        (3, "pure ascii baseline text"),
    ]
    sf_dir = str(tmp_path / "nonascii")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf_dir + "/documents.parquet"
    )
    got = (
        q.spark_queries()["multimodal_png_roundtrip"](spark, sf_dir)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(q.oracle_queries()["multimodal_png_roundtrip"])
        .df()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)],
        check_dtype=False,
    )
