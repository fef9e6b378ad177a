"""Video container plumbing + frame-sampled near-dup (sources/video.py).
The catalog lane's golden oracle attests the fixture family end to end;
these tests verify the container invariants (header-only parse, exact
byte-range framing, sampling stride), error containment (corrupt
container vs corrupt single frame), cross-format frame hashing, and
the operator == naive-reference equivalence on an independent family."""

from __future__ import annotations

import itertools

import pytest

from tcdb_spark.sources.multimodal import (
    ahash_image,
    decode_ppm,
    encode_png,
    make_patterned_ppm,
)
from tcdb_spark.sources.video import (
    decode_video_meta,
    encode_video,
    iter_video_frames,
    video_frame_hashes,
    video_near_dup_pairs,
)


def _frames(prefix: str, n: int, **kw) -> list[bytes]:
    return [make_patterned_ppm(f"{prefix}-{i}", **kw) for i in range(n)]


def test_container_round_trip_and_header_only_meta():
    frames = _frames("rt", 5)
    payload = encode_video(frames, fps=24.0)
    meta = decode_video_meta(payload)
    assert meta["n_frames"] == 5
    assert meta["fps"] == 24.0
    assert meta["lengths"] == [len(f) for f in frames]
    # offsets index straight into the payload: frame k is an exact slice
    for k, f in enumerate(frames):
        off = meta["offsets"][k]
        assert payload[off : off + meta["lengths"][k]] == f
    assert [f for _, f in iter_video_frames(payload)] == frames


def test_sampling_stride_touches_only_selected_frames():
    frames = _frames("stride", 7)
    payload = encode_video(frames, fps=1.0)
    sampled = list(iter_video_frames(payload, every_n=3))
    assert [idx for idx, _ in sampled] == [0, 3, 6]
    assert [f for _, f in sampled] == [frames[0], frames[3], frames[6]]


def test_corrupt_containers_raise_value_error():
    good = encode_video(_frames("c", 2))
    for bad in (
        b"NOPE" + good[4:],          # wrong magic
        good[:8],                    # truncated header
        good[:14],                   # truncated frame table
        good[:-10],                  # payload shorter than table claims
    ):
        with pytest.raises(ValueError):
            decode_video_meta(bad)
    with pytest.raises(ValueError):
        encode_video([])


def test_banded_params_guard():
    with pytest.raises(ValueError):
        video_near_dup_pairs(None, max_hamming=8, bands=8)


def test_frame_hashes_distributed_matches_local(spark):
    vids = [
        (1, encode_video(_frames("d1", 4))),
        (2, encode_video(_frames("d2", 3))),
    ]
    media = spark.createDataFrame(
        [(v, bytearray(p)) for v, p in vids], "video_id long, payload binary"
    )
    got = {
        (r["video_id"], r["frame_idx"]): (r["n_frames"], r["ahash"])
        for r in video_frame_hashes(media).collect()
    }
    for vid, p in vids:
        meta = decode_video_meta(p)
        for idx, frame in iter_video_frames(p):
            h = ahash_image(frame)
            h = h - (1 << 64) if h >= (1 << 63) else h
            assert got[(vid, idx)] == (meta["n_frames"], h)


def test_garbage_video_and_single_bad_frame_stay_contained(spark):
    frames = _frames("bad", 3)
    frames[1] = b"this is not an image"
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_video(frames))),
            (2, bytearray(b"not a container")),
        ],
        "video_id long, payload binary",
    )
    rows = video_frame_hashes(media).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    # the corrupt FRAME nulls only its own index; siblings hash fine
    v1 = {r["frame_idx"]: r["ahash"] for r in by_vid[1]}
    assert v1[1] is None and v1[0] is not None and v1[2] is not None
    # the corrupt CONTAINER yields one schema-stable null row
    assert len(by_vid[2]) == 1 and by_vid[2][0]["frame_idx"] is None


def test_cross_format_frames_hash_identically_in_video_path():
    ppm = make_patterned_ppm("xfmt")
    png = encode_png(decode_ppm(ppm)["pixels"])
    va = encode_video([ppm, ppm])
    vb = encode_video([png, png])
    ha = [ahash_image(f) for _, f in iter_video_frames(va)]
    hb = [ahash_image(f) for _, f in iter_video_frames(vb)]
    assert ha == hb


def test_near_dup_pairs_match_naive_reference(spark):
    # Independent family (distinct from the catalog fixture): 4 base
    # videos, one brightness re-encode, one 3-frame trim.
    fam = {
        1: _frames("n1", 6),
        2: _frames("n1", 6, brightness=4),
        3: _frames("n1", 6)[:3],
        4: _frames("n2", 6),
        5: _frames("n3", 5),
    }
    vids = [(vid, encode_video(fr)) for vid, fr in fam.items()]
    hashes = {
        vid: [(i, ahash_image(f)) for i, f in iter_video_frames(p)]
        for vid, p in vids
    }
    expected = set()
    for (va, _), (vb, _) in itertools.combinations(vids, 2):
        ma = {
            ia
            for ia, ha in hashes[va]
            for _, hb in hashes[vb]
            if bin(ha ^ hb).count("1") <= 7
        }
        mb = {
            ib
            for ib, hb in hashes[vb]
            for _, ha in hashes[va]
            if bin(ha ^ hb).count("1") <= 7
        }
        if ma and max(len(ma) / len(hashes[va]), len(mb) / len(hashes[vb])) >= 0.6:
            expected.add((va, vb, len(ma), len(mb)))
    assert {(a, b) for a, b, *_ in expected} == {(1, 2), (1, 3), (2, 3)}
    media = spark.createDataFrame(
        [(v, bytearray(p)) for v, p in vids], "video_id long, payload binary"
    )
    got = {
        (r["video_id_a"], r["video_id_b"], r["matched_a"], r["matched_b"])
        for r in video_near_dup_pairs(video_frame_hashes(media)).collect()
    }
    assert got == expected


def test_trim_containment_fractions(spark):
    base = _frames("trim", 8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_video(base))),
            (2, bytearray(encode_video(base[:4]))),
        ],
        "video_id long, payload binary",
    )
    rows = video_near_dup_pairs(video_frame_hashes(media)).collect()
    assert len(rows) == 1
    r = rows[0]
    # the 4-frame trim is fully covered (containment side = 1.0); the
    # 8-frame original is half covered
    assert r["match_frac_b"] == 1.0 and r["match_frac_a"] == 0.5


def test_video_resize_frames_round_trip(spark):
    from tcdb_spark.sources.multimodal import decode_image
    from tcdb_spark.sources.video import video_resize_frames

    frames = _frames("rz", 6, width=32, height=24)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_video(frames, fps=4.0))),
            (2, bytearray(b"not a video")),
        ],
        "video_id long, payload binary",
    )
    rows = {r["video_id"]: r for r in video_resize_frames(media, 16, 12, every_n=2).collect()}
    out = rows[1]
    assert out["n_frames"] == 6 and out["n_sampled"] == 3
    meta = decode_video_meta(bytes(out["payload"]))
    assert meta["n_frames"] == 3
    assert meta["fps"] == 2.0  # stride 2 halves the frame rate
    for _, frame in iter_video_frames(bytes(out["payload"])):
        img = decode_image(frame)
        assert (img["width"], img["height"]) == (16, 12)
    assert rows[2]["payload"] is None and rows[2]["n_frames"] is None


def test_video_resize_drops_only_bad_frames(spark):
    from tcdb_spark.sources.video import video_resize_frames

    frames = _frames("rzb", 4)
    frames[2] = b"garbage frame"
    media = spark.createDataFrame(
        [(1, bytearray(encode_video(frames)))], "video_id long, payload binary"
    )
    out = video_resize_frames(media, 8, 6).collect()[0]
    assert out["n_frames"] == 4 and out["n_sampled"] == 3
    assert decode_video_meta(bytes(out["payload"]))["n_frames"] == 3


def test_jpeg_frame_hash_stable_across_decode_paths(monkeypatch):
    # The catalog fixture re-encodes one frame as near-lossless JPEG;
    # native libjpeg and the stdlib decoder may differ by +/-1 gray
    # level, which must NEVER flip an aHash cell on the high-contrast
    # pattern family (cells sit ~190 levels apart) — otherwise the
    # golden would depend on which decode path the executor loaded.
    from tcdb_spark.plans.queries_multimodal import _V2_FRAMES

    jpeg_frame = _V2_FRAMES[5]
    with_native = ahash_image(jpeg_frame)
    monkeypatch.setenv("TCDB_SPARK_NATIVE_CODECS", "0")
    without_native = ahash_image(jpeg_frame)
    assert with_native == without_native
