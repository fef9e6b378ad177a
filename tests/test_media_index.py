"""Incremental perceptual-hash index (sources/multimodal.ahash_bands +
incremental_ahash_candidates): day-N media joined against a stored band
index must reproduce the one-shot banded join's verdicts exactly —
batch-split invariance is the property that makes daily media dedup of
a growing corpus feasible."""

from __future__ import annotations

from tcdb_spark.sources.multimodal import (
    ahash_bands,
    incremental_ahash_candidates,
    make_patterned_ppm,
    media_ahash,
    media_near_dup_pairs,
)
from tcdb_spark.sources.spectral import audio_spectral_hash, make_seeded_audio


def _image_df(spark, items):
    return spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in items], "media_id long, payload binary"
    )


def _corpus():
    # 3 dup families (base + brightness re-encode) + singletons, spread
    # across two "days" so every pair class occurs: within day 1,
    # within day 2, and across the boundary.
    day1 = [
        (1, make_patterned_ppm("f1")),
        (2, make_patterned_ppm("f1", brightness=4)),
        (3, make_patterned_ppm("f2")),
        (4, make_patterned_ppm("solo1")),
    ]
    day2 = [
        (5, make_patterned_ppm("f2", brightness=6)),   # crosses the boundary
        (6, make_patterned_ppm("f3")),
        (7, make_patterned_ppm("f3", brightness=3)),   # within day 2
        (8, make_patterned_ppm("solo2")),
    ]
    return day1, day2


def test_incremental_union_equals_one_shot(spark):
    day1, day2 = _corpus()
    full = media_near_dup_pairs(media_ahash(_image_df(spark, day1 + day2)))
    expected = sorted(tuple(r) for r in full.collect())
    assert len(expected) == 3  # (1,2), (3,5), (6,7)

    # day 1 bootstraps the index: one-shot within-day pairs + band rows
    idx1 = ahash_bands(media_ahash(_image_df(spark, day1)))
    day1_pairs = media_near_dup_pairs(media_ahash(_image_df(spark, day1)))
    # day 2 arrives: incremental join against the stored index
    new_bands = ahash_bands(media_ahash(_image_df(spark, day2)))
    inc_pairs = incremental_ahash_candidates(idx1, new_bands)

    got = sorted(
        tuple(r) for r in day1_pairs.unionByName(inc_pairs).distinct().collect()
    )
    assert got == expected
    # the cross-boundary pair names the NEW item on the b side
    assert (3, 5, 3) in [tuple(r) for r in inc_pairs.collect()] or any(
        a == 3 and b == 5 for a, b, _ in got
    )


def test_incremental_works_for_audio_hashes(spark):
    # the index shape is hash-source-agnostic: spectrogram hashes ride
    # the same band rows
    clips1 = [(1, make_seeded_audio(seed="ai1")), (2, make_seeded_audio(seed="ai2"))]
    clips2 = [
        (3, make_seeded_audio(seed="ai1", gain=0.5)),  # dup of 1, across days
        (4, make_seeded_audio(seed="ai3")),
    ]
    def adf(items):
        return spark.createDataFrame(
            [(mid, bytearray(p)) for mid, p in items], "media_id long, payload binary"
        )

    idx = ahash_bands(audio_spectral_hash(adf(clips1)))
    inc = incremental_ahash_candidates(idx, ahash_bands(audio_spectral_hash(adf(clips2))))
    got = [(r["media_id_a"], r["media_id_b"]) for r in inc.collect()]
    assert got == [(1, 3)]


def test_incremental_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        incremental_ahash_candidates(None, None, max_hamming=9, bands=8)
