"""Independent analytic verification of the spectral audio surface
(sources/spectral.py).  The catalog lanes' golden oracles attest
plumbing + determinism (expected rows computed by the same pipeline);
these tests verify the MATH against closed-form facts the pipeline
doesn't know: bin-exact dominant frequency of a pure tone, Parseval
band sums, flatness ordering (noise > tone), WAV==FLAC lossless
parity through both decode paths, amplitude-scale hash invariance,
and the pigeonhole exactness of the banded Hamming join on audio
hashes."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest

from tcdb_spark.sources.multimodal import encode_flac, media_near_dup_pairs
from tcdb_spark.sources.spectral import (
    FRAME,
    SPECTRAL_BANDS,
    SPECTRAL_DIM,
    audio_spectral,
    audio_spectral_hash,
    decode_any_audio,
    make_seeded_audio,
    make_tone_wav,
    power_spectrogram,
    spectral_features,
    spectral_hash,
    _pcm16_wav,
    _tone_samples,
)

SR = 8000
BIN_HZ = SR / FRAME  # 31.25


def _feat(payload: bytes) -> list[float]:
    return spectral_features(decode_any_audio(payload))


def test_pure_tone_dominant_and_centroid_bin_exact():
    # 1000 Hz = exactly bin 32: zero leakage outside adjacent bins from
    # the Hann window, dominant must be the exact bin frequency.
    f = _feat(make_tone_wav([(1000.0, 0.5)]))
    assert len(f) == SPECTRAL_DIM
    centroid, dominant, rolloff, flatness = f[:4]
    assert dominant == pytest.approx(1000.0)
    assert centroid == pytest.approx(1000.0, abs=BIN_HZ / 2)
    assert 1000.0 <= rolloff <= 1000.0 + 2 * BIN_HZ
    assert flatness < 1e-3  # a tone is maximally non-flat


def test_band_fractions_sum_to_one_and_concentrate():
    # Parseval over the band partition: fractions of non-DC power must
    # sum to 1; a bin-aligned tone concentrates in its band (Hann
    # leakage reaches only adjacent bins, which stay within the band
    # for an interior bin).
    f = _feat(make_tone_wav([(750.0, 0.5)]))
    bands = f[4:]
    assert len(bands) == SPECTRAL_BANDS
    assert sum(bands) == pytest.approx(1.0, abs=1e-9)
    # 750 Hz = bin 24 -> non-DC index 23, interior to band 1 (indices
    # 16..31): the Hann leakage bins 23 +/- 1 stay inside the band.
    assert bands[1] > 0.95


def test_two_tone_band_split_and_rolloff():
    f = _feat(make_tone_wav([(500.0, 0.3), (2500.0, 0.3)]))
    bands = f[4:]
    # 500 Hz = bin 16 -> index 15 -> band 0; 2500 Hz = bin 80 -> index 79
    # -> band 4 (indices 64..79).
    assert bands[0] > 0.4 and bands[4] > 0.4
    # equal amplitudes: 85% rolloff must sit at/above the upper tone
    assert f[2] >= 2500.0 - BIN_HZ


def test_noise_flatter_than_tone():
    rng_bytes = hashlib.md5(b"spectral-noise").digest() * 512
    noise = (
        np.frombuffer(rng_bytes[: 2048 * 2], dtype="<i2").astype(np.float64) / 8.0
    ).astype(np.int64)
    flat_noise = spectral_features(
        decode_any_audio(_pcm16_wav(noise, SR))
    )[3]
    flat_tone = _feat(make_tone_wav([(1000.0, 0.5)]))[3]
    assert flat_noise > 10 * flat_tone


def test_silence_all_zero_features_no_nan():
    silent = _pcm16_wav(np.zeros(2048, dtype=np.int64), SR)
    f = _feat(silent)
    assert f == [0.0] * SPECTRAL_DIM


def test_short_clip_pads_to_one_frame():
    tiny = _pcm16_wav(_tone_samples([(1000.0, 0.5)], SR, 64), SR)
    assert power_spectrogram(decode_any_audio(tiny)).shape[0] == 1
    assert len(_feat(tiny)) == SPECTRAL_DIM


def test_wav_flac_lossless_parity_all_encoder_modes():
    # The SAME int16 samples through WAV and every FLAC encoder mode
    # must featurize bit-identically (FLAC is lossless; decode_any_audio
    # routes FLAC through the native-first seam).
    ints = _tone_samples([(700.0, 0.3), (1900.0, 0.25)], SR, 2048)
    ref = spectral_features(decode_any_audio(_pcm16_wav(ints, SR)))
    for mode in ("verbatim", "constant", "fixed2", "lpc1"):
        flac = encode_flac(ints / 32768.0, SR, mode=mode)
        assert spectral_features(decode_any_audio(flac)) == ref, mode
        assert spectral_hash(decode_any_audio(flac)) == spectral_hash(
            decode_any_audio(_pcm16_wav(ints, SR))
        ), mode


def test_hash_amplitude_scale_invariance():
    base = make_seeded_audio(seed="inv")
    quiet = make_seeded_audio(seed="inv", gain=0.3)
    d = bin(
        spectral_hash(decode_any_audio(base))
        ^ spectral_hash(decode_any_audio(quiet))
    ).count("1")
    assert d <= 1  # int16 re-quantization may graze one floor-energy cell


def test_hash_separation_edit_vs_unrelated():
    h = {
        name: spectral_hash(decode_any_audio(make_seeded_audio(**kw)))
        for name, kw in {
            "base": dict(seed="sep1"),
            "edit": dict(seed="sep1", perturb_segments=(3,)),
            "other": dict(seed="sep2"),
        }.items()
    }
    d_edit = bin(h["base"] ^ h["edit"]).count("1")
    d_other = bin(h["base"] ^ h["other"]).count("1")
    assert d_edit <= 8
    assert d_other >= 16
    assert d_edit < d_other


def test_banded_join_matches_naive_popcount(spark):
    # Pigeonhole exactness of media_near_dup_pairs on AUDIO hashes: the
    # distributed banded join must reproduce the naive all-pairs
    # popcount verdicts exactly at max_hamming < bands.
    clips = [
        (i + 1, make_seeded_audio(seed=f"join{i // 3}", gain=1.0 - 0.2 * (i % 3)))
        for i in range(9)
    ]
    hashes = {
        mid: spectral_hash(decode_any_audio(p)) for mid, p in clips
    }
    expected = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for (a, _), (b, _) in itertools.combinations(clips, 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 7
    )
    assert len(expected) >= 9  # three gain-variant triples
    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in clips], "media_id long, payload binary"
    )
    got = sorted(
        tuple(r)
        for r in media_near_dup_pairs(
            audio_spectral_hash(media), max_hamming=7, bands=8
        ).collect()
    )
    assert got == expected


def test_audio_spectral_distributed_matches_local(spark):
    payloads = [
        (1, make_tone_wav([(1000.0, 0.5)])),
        (2, make_seeded_audio(seed="dist")),
        (3, b"not audio at all"),
    ]
    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in payloads], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in audio_spectral(media).collect()}
    for mid, p in payloads[:2]:
        audio = decode_any_audio(p)
        assert rows[mid]["sample_rate"] == audio["sample_rate"]
        assert rows[mid]["features"] == spectral_features(audio)
    # garbage stays schema-stable as a null row, never an executor error
    assert rows[3]["features"] is None and rows[3]["sample_rate"] is None


def test_segment_dominant_tracks_planted_tones():
    # make_seeded_audio plants 2 tones per 512-sample segment; with
    # win == hop == 512 samples each window must report the STRONGER
    # planted tone (amp 0.30 voice) as its dominant frequency exactly.
    from tcdb_spark.sources.spectral import FRAME, segment_features

    seed = "seg-analytic"
    audio = decode_any_audio(make_seeded_audio(seed=seed))
    rows = segment_features(audio, win_s=0.064, hop_s=0.064)
    assert len(rows) == 8
    bin_hz = 8000 / FRAME
    for seg, t0, feats in rows:
        h = hashlib.md5(f"{seed}|{seg}|0".encode()).digest()
        planted = (4 + int.from_bytes(h[:4], "big") % 120) * bin_hz
        assert feats[1] == pytest.approx(planted), seg
        assert t0 == seg * 64  # 512 samples @ 8 kHz = 64 ms hops


def test_segment_features_wav_flac_parity_and_distributed(spark):
    from tcdb_spark.sources.spectral import audio_segments, segment_features

    wav = make_seeded_audio(seed="seg-par")
    flac = make_seeded_audio(seed="seg-par", as_flac="lpc1")
    local = segment_features(decode_any_audio(wav), 0.064, 0.032)
    assert local == segment_features(decode_any_audio(flac), 0.064, 0.032)
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = audio_segments(media, 0.064, 0.032).collect()
    got = [
        (r["seg_idx"], r["t0_ms"], r["features"])
        for r in rows
        if r["media_id"] == 1
    ]
    assert sorted(got) == [(s, t, f) for s, t, f in local]
    junk = [r for r in rows if r["media_id"] == 2]
    assert len(junk) == 1 and junk[0]["features"] is None


def test_silence_trim_bounds_and_gain_invariance(spark):
    from tcdb_spark.sources.spectral import (
        audio_silence_trim,
        silence_bounds,
    )

    sil = np.zeros(2000, dtype=np.int64)
    tone = _tone_samples([(1000.0, 0.5)], SR, 4000)
    clip = np.concatenate([sil, tone, sil])
    s, e, r = silence_bounds(decode_any_audio(_pcm16_wav(clip, SR)))
    # frame-quantized bounds must bracket the true 250-750 ms span
    assert s <= 250 and 750 <= e <= 1000
    assert 0.4 < r < 0.65
    # relative threshold => exact integer gain scaling changes nothing
    assert silence_bounds(decode_any_audio(_pcm16_wav(clip // 4, SR))) == (s, e, r)
    # distributed twin + junk containment
    media = spark.createDataFrame(
        [(1, bytearray(_pcm16_wav(clip, SR))), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {row["media_id"]: row for row in audio_silence_trim(media).collect()}
    assert (rows[1]["start_ms"], rows[1]["end_ms"]) == (s, e)
    assert rows[1]["duration_ms"] == 1000
    assert rows[2]["start_ms"] is None
