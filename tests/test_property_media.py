"""Hypothesis properties for the session-3 media surface — all local
(no SparkSession), so the example counts stay high:

- WAV==FLAC spectral parity for ARBITRARY int16 sample arrays through
  every FLAC encoder mode (losslessness carried all the way to the
  feature vector, not just the samples);
- spectral features are always finite and well-formed for arbitrary
  input (band fractions sum to 1 or are all zero — no NaN ever rides
  into a filter);
- spectral-hash gain invariance for arbitrary signals and gains;
- TCVC container: arbitrary byte-string frames round-trip exactly, and
  EVERY strict prefix of a container is rejected (no silent partial
  reads of a truncated object-storage GET);
- Bloom positions: the Spark-side SQL mirror and the pure-Python
  reference agree for arbitrary keys (via the oracle-side
  position_sql string evaluated in DuckDB)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from hypothesis import given, settings, strategies as st

from tcdb_spark.sources.multimodal import encode_flac
from tcdb_spark.sources.spectral import (
    SPECTRAL_DIM,
    _pcm16_wav,
    decode_any_audio,
    spectral_features,
    spectral_hash,
)
from tcdb_spark.sources.video import (
    decode_video_meta,
    encode_video,
    iter_video_frames,
)

samples_st = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
)


@settings(max_examples=40, deadline=None)
@given(samples_st, st.sampled_from(["verbatim", "constant", "fixed2", "lpc1"]))
def test_wav_flac_feature_parity_property(samples, mode):
    ints = np.asarray(samples, dtype=np.int64)
    wav_feats = spectral_features(decode_any_audio(_pcm16_wav(ints, 8000)))
    flac = encode_flac(ints / 32768.0, 8000, mode=mode)
    assert spectral_features(decode_any_audio(flac)) == wav_feats


@settings(max_examples=60, deadline=None)
@given(samples_st)
def test_features_always_finite_and_band_sum_property(samples):
    ints = np.asarray(samples, dtype=np.int64)
    f = spectral_features(decode_any_audio(_pcm16_wav(ints, 8000)))
    assert len(f) == SPECTRAL_DIM
    assert all(math.isfinite(v) for v in f)
    band_sum = sum(f[4:])
    assert band_sum == 0.0 or abs(band_sum - 1.0) < 1e-9


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-8000, max_value=8000), min_size=300, max_size=600
    ),
    st.integers(min_value=2, max_value=4),
)
def test_hash_exact_gain_invariance_property(samples, mult):
    # EXACT power-of-signal scaling (integer multiply, no requantization
    # noise): every log cell shifts by the same constant, the threshold
    # shifts with them, the hash is bit-identical.
    ints = np.asarray(samples, dtype=np.int64)
    h1 = spectral_hash(decode_any_audio(_pcm16_wav(ints, 8000)))
    h2 = spectral_hash(decode_any_audio(_pcm16_wav(ints * mult, 8000)))
    assert h1 == h2


frames_st = st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(frames_st, st.floats(min_value=0.25, max_value=120.0))
def test_tcvc_round_trip_property(frames, fps):
    payload = encode_video(frames, fps=fps)
    meta = decode_video_meta(payload)
    assert meta["n_frames"] == len(frames)
    assert abs(meta["fps"] - fps) <= 0.0005  # fps*1000 rounds to int
    assert [f for _, f in iter_video_frames(payload)] == frames


@settings(max_examples=40, deadline=None)
@given(frames_st, st.data())
def test_tcvc_every_strict_prefix_rejected_property(frames, data):
    import pytest

    payload = encode_video(frames, fps=1.0)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        decode_video_meta(payload[:cut])


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=40), st.integers(min_value=0, max_value=4))
def test_bloom_position_python_duckdb_agreement_property(key, i):
    import duckdb

    from tcdb_spark.operators.bloom import position_sql

    # the pure-Python reference used across the bloom tests
    h = hashlib.md5(f"{key}|{i}".encode()).hexdigest()
    poly = 0
    for j in range(8):
        poly = poly * 131 + ord(h[j])
    ref = poly % 4096
    got = duckdb.sql(
        "WITH t AS (SELECT ? AS k) SELECT "
        + position_sql("k", i, 4096)
        + " FROM t",
        params=[key],
    ).fetchone()[0]
    assert got == ref
