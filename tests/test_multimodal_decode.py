"""Real multimodal decoding: PPM pixels and WAV samples parsed from
actual bytes, with closed-form expected values (not golden-vs-self)."""

import struct

import numpy as np
import pytest

from tcdb_spark.sources.multimodal import (
    decode_ppm,
    decode_wav,
    extract_features,
    make_test_ppm,
    make_test_wav,
    media_features,
)


def test_decode_ppm_exact_pixels():
    img = decode_ppm(make_test_ppm(width=4, height=3))
    assert (img["width"], img["height"], img["maxval"]) == (4, 3, 255)
    # pixel (x=2, y=1) = (2*30, 1*40, 3*10) by construction
    assert img["pixels"][1, 2].tolist() == [60, 40, 30]
    assert img["pixels"].shape == (3, 4, 3)


def test_decode_pgm_grayscale():
    pgm = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    img = decode_ppm(pgm)
    assert img["pixels"].shape == (2, 2, 1)
    assert img["pixels"].flatten().tolist() == [0, 64, 128, 255]
    feats = media_features(pgm)
    assert feats[:3] == [2.0, 2.0, 1.0]
    assert feats[3] == pytest.approx((0 + 64 + 128 + 255) / 4 / 255)
    assert feats[5] == 0.0 and feats[6] == 1.0  # min/max normalized


def test_decode_wav_square_wave_closed_form():
    wav = decode_wav(make_test_wav(sample_rate=8000, n_frames=800))
    assert wav["sample_rate"] == 8000 and wav["n_channels"] == 1
    assert wav["samples"].shape == (800, 1)
    feats = media_features(make_test_wav(sample_rate=8000, n_frames=800))
    assert feats[0] == 8000.0
    assert feats[2] == pytest.approx(0.1)  # 800 frames / 8000 Hz
    assert feats[3] == 0.25  # rms of a +/-8192 square wave, exactly
    assert feats[4] == 0.25  # peak
    assert feats[6] == 0.0  # symmetric wave: zero mean
    assert feats[7] == 0.5  # dynamic range


def test_decode_wav_8bit_and_word_alignment():
    # 3-byte (odd) data chunk must be padded to the word boundary
    data = bytes([128, 255, 0])
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data + b"\x00"
    body += b"LIST" + struct.pack("<I", 4) + b"INFO"  # trailing chunk
    wav = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert wav["samples"].flatten().tolist() == [0.0, 127 / 128, -1.0]


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI ")
    assert media_features(b"not media") is None


def test_extract_features_routes_real_and_stub(spark):
    rows = [
        (1, bytearray(make_test_ppm()), "image/ppm"),
        (2, bytearray(make_test_wav()), "audio/wav"),
        (3, bytearray(b"opaque-blob"), "video"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string"
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[1]["features"][0] == 8.0  # real PPM width
    assert out[2]["features"][3] == 0.25  # real WAV rms
    assert len(out[3]["features"]) == 8  # stub fallback still shaped
    # strict mode: unrecognized bytes raise where the codec would sit
    strict = extract_features(media, decode_stub=False)
    with pytest.raises(Exception, match="codec"):
        strict.collect()


def test_resize_ppm_closed_form():
    """Nearest-neighbor resize: output dims honored, sampled pixels land
    where the index map says, downscale+roundtrip stays decodable."""
    import numpy as np

    from tcdb_spark.sources.multimodal import decode_ppm, make_test_ppm, resize_ppm

    src = make_test_ppm(width=8, height=6)
    out = resize_ppm(src, 4, 3)
    img = decode_ppm(out)
    assert (img["width"], img["height"]) == (4, 3)
    # output pixel (x, y) samples source pixel (x*8//4, y*6//3) = (2x, 2y)
    src_px = decode_ppm(src)["pixels"]
    assert np.array_equal(img["pixels"][1, 2], src_px[2, 4])
    # upscale replicates
    up = decode_ppm(resize_ppm(src, 16, 12))
    assert np.array_equal(up["pixels"][0, 0], src_px[0, 0])
    assert np.array_equal(up["pixels"][1, 1], src_px[0, 0])


def test_resize_media_distributed(spark):
    """The Arrow op resizes Netpbm payloads in place and passes unknown
    formats through untouched (stub mode)."""
    from tcdb_spark.sources.multimodal import decode_ppm, make_test_ppm, resize_media

    rows = [
        (1, bytearray(make_test_ppm(8, 6)), "image/ppm"),
        (2, bytearray(b"\x00\x01notanimage"), "application/octet-stream"),
        (3, None, "image/ppm"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string"
    )
    got = {r["media_id"]: r for r in resize_media(media, 4, 3).collect()}
    resized = decode_ppm(bytes(got[1]["payload"]))
    assert (resized["width"], resized["height"]) == (4, 3)
    assert bytes(got[2]["payload"]) == b"\x00\x01notanimage"
    assert got[3]["payload"] is None
    assert all(r["width"] == 4 and r["height"] == 3 for r in got.values())


def test_resample_wav_closed_form():
    """Downsample by exactly 2x on a triangle wave: linear interp on a
    piecewise-linear signal lands exactly on the original even samples
    (grid points coincide), so the roundtrip is bit-exact."""
    import struct

    import numpy as np

    from tcdb_spark.sources.multimodal import decode_wav, resample_wav

    # triangle wave, 16-bit mono, 8 kHz
    n, amp = 64, 8192
    tri = [amp * (1 - abs((i % 16) - 8) / 8.0) for i in range(n)]
    data = b"".join(struct.pack("<h", int(round(s))) for s in tri)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body

    out = resample_wav(wav, 4000)
    dec = decode_wav(out)
    assert dec["sample_rate"] == 4000
    assert dec["samples"].shape == (32, 1)
    orig = decode_wav(wav)["samples"][::2, 0]
    assert np.array_equal(dec["samples"][:, 0], orig)


def test_resample_media_distributed(spark):
    from pyspark.sql import functions as F

    from tcdb_spark.sources.multimodal import (
        decode_wav,
        make_test_wav,
        resample_media,
    )

    rows = [(1, bytearray(make_test_wav(sample_rate=8000, n_frames=800))),
            (2, None)]
    media = spark.createDataFrame(rows, "media_id long, payload binary").repartition(2)
    out = {r.media_id: r for r in resample_media(media, 2000).collect()}
    assert out[1].sample_rate == 2000
    dec = decode_wav(bytes(out[1].payload))
    assert dec["sample_rate"] == 2000 and dec["samples"].shape[0] == 200
    assert out[2].payload is None


def test_map_in_arrow_twin_matches_pandas_lane(spark):
    """extract_features_arrow (mapInArrow) must produce exactly the
    rows of extract_features (mapInPandas) on mixed real+stub payloads."""
    from tcdb_spark.sources.multimodal import (
        extract_features,
        extract_features_arrow,
        make_test_ppm,
        make_test_wav,
    )

    rows = [
        (1, bytearray(make_test_ppm(4, 3)), "image"),
        (2, bytearray(make_test_wav(64)), "audio"),
        (3, bytearray(b"\x00\x01opaqueblob"), "video"),
        (4, None, "image"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload", "media_type"])
    a = {r["media_id"]: r.asDict() for r in extract_features(df).collect()}
    b = {r["media_id"]: r.asDict() for r in extract_features_arrow(df).collect()}
    assert a == b
    assert a[1]["features"] is not None and a[4]["features"] is None
