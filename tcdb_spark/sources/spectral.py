"""Frequency-domain audio analysis over opaque audio payloads.

§2.12 extension surface (the reference engine has no audio path): the
standard spectral primitives a multimodal training-data pipeline needs
before any audio model sees a byte — per-clip spectral features
(centroid / dominant frequency / rolloff / flatness / band energy
profile) for quality filtering and stratification, and a 64-bit
spectrogram perceptual hash for near-duplicate detection (the audio
twin of the image aHash in ``sources/multimodal.py``; the SAME banded
Hamming join ``media_near_dup_pairs`` consumes both).

Everything is derived from the decoded PCM dict that
``multimodal.decode_wav`` / ``multimodal.decode_audio`` produce
({sample_rate, n_channels, samples}), so WAV and FLAC payloads of the
same material featurize identically (FLAC is lossless — pinned in
tests), and the native-codec routing seam applies unchanged.

Scale shape: the mapInPandas featurizers ride the scan — payloads never
cross a shuffle; only fixed-width feature rows / 8-byte hashes continue
into downstream joins.  The FFT work is numpy-vectorized per Arrow
batch (one ``rfft`` over a (n_frames, frame) matrix per clip), so the
per-byte cost tracks the native decode throughput, not Python loop
speed.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

from tcdb_spark.sources.multimodal import AHASH_SCHEMA, decode_audio, decode_wav

# Analysis geometry: 256-sample Hann frames, half-overlap.  129 rfft
# bins; the DC bin is excluded from bands/flatness/hash (a constant
# offset is level, not timbre), leaving 128 bins = 8 bands x 16 bins.
FRAME = 256
HOP = 128
SPECTRAL_BANDS = 8
SPECTRAL_DIM = 4 + SPECTRAL_BANDS  # centroid, dominant, rolloff, flatness + bands
HASH_GRID = 8  # 8 time segments x 8 freq bands -> 64-bit hash

_EPS = 1e-20


def decode_any_audio(payload: bytes) -> dict:
    """Magic-routed PCM decode: RIFF/WAVE -> ``decode_wav``, fLaC ->
    ``decode_audio`` (native-first FLAC).  Raises ValueError for
    non-audio bytes — callers decide whether to stub."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        return decode_audio(payload)
    raise ValueError("not a recognized audio payload (RIFF/WAVE or fLaC)")


def power_spectrogram(audio: dict, frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """(n_frames, frame//2 + 1) Hann-windowed power spectrogram of the
    mono mix.  Clips shorter than one frame are zero-padded to exactly
    one frame so every decodable clip featurizes."""
    s = np.asarray(audio["samples"], dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    mono = s.mean(axis=1)
    if len(mono) < frame:
        mono = np.pad(mono, (0, frame - len(mono)))
    starts = np.arange(0, len(mono) - frame + 1, hop)
    idx = starts[:, None] + np.arange(frame)[None, :]
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    spec = np.fft.rfft(mono[idx] * win, axis=1)
    return spec.real**2 + spec.imag**2


def spectral_features(
    audio: dict, n_bands: int = SPECTRAL_BANDS, frame: int = FRAME, hop: int = HOP
) -> list[float]:
    """Fixed-dim clip descriptor over the time-averaged power spectrum:

    ``[centroid_hz, dominant_hz, rolloff85_hz, flatness,
       band_frac_0 .. band_frac_{n_bands-1}]``

    - centroid: power-weighted mean frequency (brightness),
    - dominant: frequency of the strongest bin,
    - rolloff85: lowest frequency below which 85% of power sits,
    - flatness: geometric/arithmetic mean ratio of non-DC bin power
      (→1 for noise, →0 for tones) — the tonality gate,
    - band_frac: non-DC power split into ``n_bands`` equal frequency
      bands, each as a fraction of non-DC power (sums to 1; amplitude
      invariant — the stratification signature).

    A silent clip returns all zeros (no NaN rides into a filter)."""
    sr = float(audio["sample_rate"])
    p = power_spectrogram(audio, frame, hop).mean(axis=0)
    freqs = np.arange(len(p)) * sr / frame
    total = float(p.sum())
    if total <= 0.0:
        return [0.0] * (4 + n_bands)
    centroid = float((p * freqs).sum() / total)
    dominant = float(freqs[int(np.argmax(p))])
    rolloff = float(freqs[int(np.searchsorted(np.cumsum(p), 0.85 * total))])
    body = p[1:]
    nz_total = float(body.sum())
    if nz_total <= 0.0:
        flatness, band_frac = 0.0, [0.0] * n_bands
    else:
        flatness = float(
            np.exp(np.mean(np.log(body + _EPS))) / (np.mean(body) + _EPS)
        )
        edges = (np.arange(n_bands + 1) * len(body)) // n_bands
        band_frac = [
            float(body[edges[b] : edges[b + 1]].sum() / nz_total)
            for b in range(n_bands)
        ]
    return [centroid, dominant, rolloff, flatness, *band_frac]


def spectral_hash(audio: dict, grid: int = HASH_GRID, frame: int = FRAME, hop: int = HOP) -> int:
    """64-bit spectrogram average-hash: the non-DC power spectrogram is
    pooled into ``grid x grid`` (time x frequency) cells of log power;
    bit = cell >= mean of all cells, packed row-major (time-major)
    MSB-first.  Returns the UNSIGNED value.

    Amplitude-scale invariance: scaling the signal by g multiplies every
    cell's power by g^2, adding a constant to every log cell AND to the
    threshold — bits with non-floor energy are unchanged (the audio
    analogue of aHash brightness invariance; pinned in tests)."""
    P = power_spectrogram(audio, frame, hop)[:, 1:]
    t, b = P.shape
    ts = (np.arange(grid + 1) * t) // grid
    bs = (np.arange(grid + 1) * b) // grid
    cells = np.empty((grid, grid))
    for r in range(grid):
        r0, r1 = ts[r], max(ts[r + 1], ts[r] + 1)
        for c in range(grid):
            cells[r, c] = np.log10(P[r0:r1, bs[c] : bs[c + 1]].mean() + _EPS)
    bits = (cells >= cells.mean()).ravel()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val


# ------------------------------------------------------- Spark operators

SPECTRAL_SCHEMA = (
    "media_id long, sample_rate double, duration_s double, features array<double>"
)


def audio_spectral(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, sample_rate, duration_s,
    features[SPECTRAL_DIM]) via Arrow-batched mapInPandas.  Undecodable
    payloads yield a null feature row (schema-stable: a 100 TB corpus
    always contains garbage; the caller filters)."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rates, durs, feats = [], [], []
            for p in pdf["payload"]:
                try:
                    audio = decode_any_audio(bytes(p))
                    n = np.asarray(audio["samples"]).shape[0]
                    rates.append(float(audio["sample_rate"]))
                    durs.append(n / float(audio["sample_rate"]))
                    feats.append(spectral_features(audio))
                except (ValueError, TypeError):
                    rates.append(None)
                    durs.append(None)
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "duration_s": durs,
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_op, schema=SPECTRAL_SCHEMA)


def audio_spectral_hash(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, ahash) — the audio twin of
    ``multimodal.media_ahash``, emitting the spectrogram hash as a
    SIGNED long under the same AHASH_SCHEMA so
    ``media_near_dup_pairs`` composes unchanged (banded Hamming join,
    pigeonhole-exact for max_hamming < bands).  Undecodable payloads
    hash to null (dropped by the join's isNotNull guard)."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                try:
                    v = spectral_hash(decode_any_audio(bytes(p)))
                    out.append(v - (1 << 64) if v >= (1 << 63) else v)
                except (ValueError, TypeError):
                    out.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"], "ahash": out})

    return media.select("media_id", "payload").mapInPandas(_op, schema=AHASH_SCHEMA)


# ------------------------------------------------------------- fixtures


def make_tone_wav(
    tones: list[tuple[float, float]],
    sample_rate: int = 8000,
    n_frames: int = 2048,
) -> bytes:
    """Deterministic 16-bit mono PCM mixture of sines: ``tones`` is
    [(freq_hz, amplitude)] with sum(|amplitude|) <= 1.  Samples are
    quantized to int16 before encoding, so the SAME integers reach WAV
    and FLAC encoders (lossless parity fixtures)."""
    return _pcm16_wav(_tone_samples(tones, sample_rate, n_frames), sample_rate)


def _tone_samples(
    tones: list[tuple[float, float]], sample_rate: int, n_frames: int
) -> np.ndarray:
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    sig = np.zeros(n_frames)
    for f, a in tones:
        sig += a * np.sin(2.0 * np.pi * f * t)
    return np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int64)


def make_seeded_audio(
    seed: str,
    n_segments: int = HASH_GRID,
    seg_frames: int = 512,
    sample_rate: int = 8000,
    gain: float = 1.0,
    perturb_segments: tuple = (),
    as_flac: str | None = None,
) -> bytes:
    """Deterministic time-VARYING audio fixture for the spectral-hash
    lane (the audio analogue of ``make_patterned_ppm``): ``n_segments``
    concatenated tone-pair segments whose frequencies come from
    md5(seed, segment, voice) snapped to analysis-bin centers — each
    time row of the spectrogram hash sees a different band profile, so
    unrelated seeds land ~32 bits apart instead of collapsing to the
    repeated-row distances a single steady tone produces.

    ``gain`` rescales the mixture before int16 quantization (hash
    invariance fixture); ``perturb_segments`` adds one extra weak tone
    to the named segments (flips only those rows' cells — the
    "locally edited copy" near-dup class).  ``as_flac`` encodes the
    SAME int samples as FLAC in the given mode instead of WAV."""
    import hashlib

    from tcdb_spark.sources.multimodal import encode_flac

    bin_hz = sample_rate / FRAME
    sig = np.zeros(n_segments * seg_frames)
    for seg in range(n_segments):
        t = (np.arange(seg_frames, dtype=np.float64) + seg * seg_frames) / sample_rate
        for voice, amp in ((0, 0.30), (1, 0.22)):
            h = hashlib.md5(f"{seed}|{seg}|{voice}".encode()).digest()
            # bins 4..123 of 128: inside the non-DC band range
            f = (4 + int.from_bytes(h[:4], "big") % 120) * bin_hz
            sig[seg * seg_frames : (seg + 1) * seg_frames] += amp * np.sin(
                2.0 * np.pi * f * t
            )
        if seg in perturb_segments:
            h = hashlib.md5(f"{seed}|perturb|{seg}".encode()).digest()
            f = (4 + int.from_bytes(h[:4], "big") % 120) * bin_hz
            sig[seg * seg_frames : (seg + 1) * seg_frames] += 0.18 * np.sin(
                2.0 * np.pi * f * t
            )
    ints = np.clip(np.round(sig * gain * 32767.0), -32768, 32767).astype(np.int64)
    if as_flac is not None:
        return encode_flac(ints / 32768.0, sample_rate, mode=as_flac)
    return _pcm16_wav(ints, sample_rate)


def _pcm16_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    data = b"".join(_struct.pack("<h", int(s)) for s in samples)
    fmt = _struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


# ------------------------------------------------- windowed segmentation

SEGMENT_SCHEMA = (
    "media_id long, seg_idx int, t0_ms long, features array<double>"
)


def segment_features(
    audio: dict,
    win_s: float = 0.25,
    hop_s: float = 0.125,
    n_bands: int = SPECTRAL_BANDS,
    frame: int = FRAME,
    fft_hop: int = HOP,
) -> list[tuple[int, int, list[float]]]:
    """Per-window spectral descriptors for LONG audio — the shape an
    ASR/audio-training pipeline needs (a 2-hour clip gets one feature
    row per ``hop_s``, not one global average).

    One FFT pass: the clip's power spectrogram is computed once
    (``power_spectrogram``), then each window pools its own frame range
    — the per-window cost is an O(bins) aggregation, not a re-FFT.
    Windows shorter than one analysis frame are skipped; the final
    partial window is kept (its frames exist).  Returns
    [(seg_idx, t0_ms, features)] with the same feature layout as
    :func:`spectral_features`."""
    sr = float(audio["sample_rate"])
    P = power_spectrogram(audio, frame, fft_hop)
    n_frames = P.shape[0]
    frames_per_win = max(1, int(round(win_s * sr / fft_hop)))
    frames_per_hop = max(1, int(round(hop_s * sr / fft_hop)))
    freqs = np.arange(P.shape[1]) * sr / frame
    out = []
    seg = 0
    for start in range(0, n_frames, frames_per_hop):
        stop = min(start + frames_per_win, n_frames)
        p = P[start:stop].mean(axis=0)
        total = float(p.sum())
        if total <= 0.0:
            feats = [0.0] * (4 + n_bands)
        else:
            centroid = float((p * freqs).sum() / total)
            dominant = float(freqs[int(np.argmax(p))])
            rolloff = float(
                freqs[int(np.searchsorted(np.cumsum(p), 0.85 * total))]
            )
            body = p[1:]
            nz = float(body.sum())
            if nz <= 0.0:
                flat, band_frac = 0.0, [0.0] * n_bands
            else:
                flat = float(
                    np.exp(np.mean(np.log(body + _EPS))) / (np.mean(body) + _EPS)
                )
                edges = (np.arange(n_bands + 1) * len(body)) // n_bands
                band_frac = [
                    float(body[edges[b] : edges[b + 1]].sum() / nz)
                    for b in range(n_bands)
                ]
            feats = [centroid, dominant, rolloff, flat, *band_frac]
        out.append((seg, int(round(start * fft_hop / sr * 1000)), feats))
        seg += 1
        if stop >= n_frames:
            break
    return out


def audio_segments(
    media: DataFrame, win_s: float = 0.25, hop_s: float = 0.125
) -> DataFrame:
    """(media_id, payload) -> one row per audio window (media_id,
    seg_idx, t0_ms, features) via Arrow-batched mapInPandas — decode
    and FFT happen ONCE per clip, windows pool frame ranges.
    Undecodable payloads yield a single null-feature row."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mid_col, seg_col, t0_col, f_col = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    audio = decode_any_audio(bytes(p))
                    rows = segment_features(audio, win_s, hop_s)
                except (ValueError, TypeError):
                    mid_col.append(mid)
                    seg_col.append(None)
                    t0_col.append(None)
                    f_col.append(None)
                    continue
                for seg, t0, feats in rows:
                    mid_col.append(mid)
                    seg_col.append(seg)
                    t0_col.append(t0)
                    f_col.append(feats)
            yield pd.DataFrame(
                {
                    "media_id": mid_col,
                    "seg_idx": seg_col,
                    "t0_ms": t0_col,
                    "features": f_col,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _op, schema=SEGMENT_SCHEMA
    )


# ---------------------------------------------------------- silence trim

TRIM_SCHEMA = (
    "media_id long, start_ms long, end_ms long, duration_ms long, "
    "active_ratio double"
)


def silence_bounds(
    audio: dict, frame: int = FRAME, hop: int = HOP, threshold: float = 0.02
) -> tuple[int, int, float]:
    """(start_ms, end_ms, active_ratio) of the non-silent span: a frame
    is ACTIVE when its RMS exceeds ``threshold`` x the clip's peak
    frame RMS (relative threshold — gain-invariant by construction).
    start/end are the first/last active frame's bounds in ms;
    active_ratio is the active-frame fraction.  An all-silent clip
    returns (0, 0, 0.0)."""
    s = np.asarray(audio["samples"], dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    mono = s.mean(axis=1)
    if len(mono) < frame:
        mono = np.pad(mono, (0, frame - len(mono)))
    starts = np.arange(0, len(mono) - frame + 1, hop)
    idx = starts[:, None] + np.arange(frame)[None, :]
    rms = np.sqrt((mono[idx] ** 2).mean(axis=1))
    peak = rms.max()
    if peak <= 0.0:
        return 0, 0, 0.0
    active = np.nonzero(rms > threshold * peak)[0]
    if len(active) == 0:
        return 0, 0, 0.0
    sr = float(audio["sample_rate"])
    start_ms = int(round(starts[active[0]] / sr * 1000))
    end_ms = int(round((starts[active[-1]] + frame) / sr * 1000))
    return start_ms, end_ms, float(len(active) / len(rms))


def audio_silence_trim(media: DataFrame, threshold: float = 0.02) -> DataFrame:
    """(media_id, payload) -> non-silent span metadata (start_ms,
    end_ms, duration_ms, active_ratio) via Arrow-batched mapInPandas —
    the VAD-style pre-trim an ASR pipeline runs before windowing;
    emitting METADATA instead of re-encoded payloads keeps the
    operator pure-scan (the caller slices payloads lazily, or drops
    clips whose active_ratio is below its quality bar).  Undecodable
    payloads yield a null row."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "start_ms", "end_ms", "duration_ms", "active_ratio")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                try:
                    audio = decode_any_audio(bytes(p))
                    n = np.asarray(audio["samples"]).shape[0]
                    start, end, ratio = silence_bounds(audio, threshold=threshold)
                    rows["start_ms"].append(start)
                    rows["end_ms"].append(end)
                    rows["duration_ms"].append(
                        int(round(n / float(audio["sample_rate"]) * 1000))
                    )
                    rows["active_ratio"].append(ratio)
                except (ValueError, TypeError):
                    rows["start_ms"].append(None)
                    rows["end_ms"].append(None)
                    rows["duration_ms"].append(None)
                    rows["active_ratio"].append(None)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(_op, schema=TRIM_SCHEMA)
