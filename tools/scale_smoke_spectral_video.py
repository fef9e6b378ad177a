"""Scale smoke for the round-7 session-3 families: spectral audio,
video near-dup, and the Bloom membership prefilter.

Measurements (local[32], printed as markdown rows for SCALE_SMOKE.md):

1. ``audio_spectral`` + ``audio_spectral_hash`` over >= 10^3 mixed
   WAV/FLAC clips — wall time and aggregate payload MB/s (the FFT
   featurizer rides the scan; the per-byte rate is what a cluster
   sizing starts from).
2. ``video_near_dup`` over a video corpus with PLANTED re-encodes and
   trims at a 2:1 sampling stride — wall time plus the attestation
   that every planted pair is found (candidate volume stays banded,
   never all-pairs).
3. ``bloom_build`` + ``bloom_probe`` at 10^6 member keys x 10^6 probe
   keys — wall time for build and probe and the measured
   false-positive rate vs the (m, k) theory value
   (1-e^{-kn/m})^k; measured==theory attests position uniformity
   (the whole point: membership at probe-scale with NO join against
   the member set).

Usage: python tools/scale_smoke_spectral_video.py [n_clips] [n_videos]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audio_smoke(spark, n_clips: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.sources.multimodal import media_near_dup_pairs
    from tcdb_spark.sources.spectral import (
        audio_spectral,
        audio_spectral_hash,
        make_seeded_audio,
    )

    # 48 distinct clip families, replicated: half WAV, a quarter FLAC
    # re-encodes of family 0-11 material, a quarter gain variants.
    base = [make_seeded_audio(seed=f"smoke{i}") for i in range(24)]
    flacs = [make_seeded_audio(seed=f"smoke{i}", as_flac="fixed2") for i in range(12)]
    gains = [make_seeded_audio(seed=f"smoke{i}", gain=0.5) for i in range(12)]
    pool = base + flacs + gains
    rows = [(i, bytearray(pool[i % len(pool)])) for i in range(n_clips)]
    total_mb = sum(len(r[1]) for r in rows) / 1e6
    # materialize as parquet and measure the READ path — the production
    # shape is scan -> featurize, not driver-local createDataFrame
    import tempfile

    tmp = tempfile.mkdtemp(prefix="spectral_smoke_")
    spark.createDataFrame(rows, "media_id long, payload binary").repartition(
        32
    ).write.mode("overwrite").parquet(tmp)
    media = spark.read.parquet(tmp)

    # untimed FULL warmup pass (bench.py discipline): the first Python
    # stage pays the worker-pool spawn across all 32 workers; that cost
    # is per-executor-lifetime, not per-query, so it must not ride the
    # recorded number (a limit() warmup warms only one worker)
    audio_spectral(media).write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    audio_spectral(media).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(
        f"| audio_spectral: {n_clips} WAV/FLAC clips ({total_mb:.1f} MB) "
        f"| {dt:.1f} s | {total_mb / dt:.1f} MB/s aggregate |",
        flush=True,
    )

    t0 = time.perf_counter()
    n_pairs = media_near_dup_pairs(audio_spectral_hash(media), 7, 8).count()
    dt = time.perf_counter() - t0
    # every replica/re-encode/gain variant of a family collides: with
    # r replicas per family the pair count is sum C(r,2) — quadratic in
    # the DUPLICATE multiplicity (real), not in the corpus (the banded
    # join's contract).
    print(
        f"| audio_near_dup: {n_clips} clips -> {n_pairs} dup pairs "
        f"| {dt:.1f} s | banded join, no all-pairs |",
        flush=True,
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def video_smoke(spark, n_videos: int) -> None:
    from tcdb_spark.sources.multimodal import make_patterned_ppm
    from tcdb_spark.sources.video import encode_video, video_frame_hashes, video_near_dup_pairs

    frames_per = 16
    vids = []
    planted = []
    for i in range(n_videos):
        fam = i // 4
        kind = i % 4
        if kind == 0:  # base
            fr = [make_patterned_ppm(f"v{fam}-{j}") for j in range(frames_per)]
        elif kind == 1:  # re-encode (brightness shift): near-dup of base
            fr = [
                make_patterned_ppm(f"v{fam}-{j}", brightness=5)
                for j in range(frames_per)
            ]
            planted.append((fam * 4, i))
        elif kind == 2:  # trim: containment dup of base
            fr = [make_patterned_ppm(f"v{fam}-{j}") for j in range(frames_per // 2)]
            planted.append((fam * 4, i))
        else:  # unrelated
            fr = [make_patterned_ppm(f"u{i}-{j}") for j in range(frames_per)]
        vids.append((i, bytearray(encode_video(fr, fps=2.0))))
    total_mb = sum(len(v[1]) for v in vids) / 1e6
    media = (
        spark.createDataFrame(vids, "video_id long, payload binary")
        .repartition(32)
        .persist()
    )
    media.count()

    t0 = time.perf_counter()
    pairs = video_near_dup_pairs(
        video_frame_hashes(media, every_n=2), max_hamming=7, min_match_frac=0.6
    )
    got = {(r["video_id_a"], r["video_id_b"]) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    missing = [p for p in planted if p not in got]
    print(
        f"| video_near_dup: {n_videos} videos x {frames_per} frames "
        f"({total_mb:.1f} MB), stride 2 | {dt:.1f} s | "
        f"{len(got)} pairs, planted {len(planted)}, missed {len(missing)} |",
        flush=True,
    )
    assert not missing, f"planted video dups missed: {missing[:5]}"
    media.unpersist()


def bloom_smoke(spark, n: int = 1_000_000) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.operators.bloom import (
        bloom_build,
        bloom_pack,
        bloom_probe,
        bloom_probe_packed,
    )

    m_bits, k = 1 << 22, 3  # theory FP = (1-e^{-kn/m})^k = 0.511^3 = 13.3%
    members = spark.range(n).select(F.md5(F.col("id").cast("string").cast("binary")).alias("key"))
    t0 = time.perf_counter()
    bloom = bloom_build(members, m_bits=m_bits, k=k).persist()
    n_words = bloom.count()
    t_build = time.perf_counter() - t0

    # probe: 50% members, 50% fresh keys
    probes = spark.range(n // 2, n + n // 2).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("key")
    )
    t0 = time.perf_counter()
    verdicts = bloom_probe(probes, bloom, m_bits=m_bits, k=k)
    hits = verdicts.where("maybe_member").count()
    t_probe = time.perf_counter() - t0

    packed = bloom_pack(bloom, m_bits=m_bits)
    t0 = time.perf_counter()
    hits_packed = (
        bloom_probe_packed(probes, packed, m_bits=m_bits, k=k)
        .where("maybe_member")
        .count()
    )
    t_packed = time.perf_counter() - t0
    assert hits_packed == hits, (hits_packed, hits)

    # exactly n/2 probes are true members; the rest that hit are FPs
    fp_rate = (hits - n // 2) / (n // 2)
    print(
        f"| bloom m=2^22 k=3: build {n} keys ({n_words} words) {t_build:.1f} s "
        f"| join-probe {n} keys {t_probe:.1f} s; packed zero-shuffle probe "
        f"{t_packed:.1f} s (equal verdicts) | FP {fp_rate * 100:.2f}% "
        f"(theory 13.3% — measured==theory is the uniformity attestation) |",
        flush=True,
    )
    bloom.unpersist()


def main() -> None:
    from tcdb_spark.session import get_spark

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_videos = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("spectral-video-smoke")
    print("| lane | wall | notes |")
    print("|---|---|---|")
    audio_smoke(spark, n_clips)
    video_smoke(spark, n_videos)
    bloom_smoke(spark)
    spark.stop()


if __name__ == "__main__":
    main()
