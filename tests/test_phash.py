"""DCT perceptual hash (sources/multimodal.phash_image): analytic DCT
pin via basis orthonormality, transform-invariance on textured content,
the MEASURED degeneracy on low-texture gradients (the honest
complementarity claim vs aHash), and composition with the shared
near-dup machinery."""

from __future__ import annotations

import numpy as np
import pytest

from tcdb_spark.sources.multimodal import (
    PHASH_INPUT,
    _dct_basis_n,
    ahash_image,
    decode_ppm,
    encode_jpeg,
    encode_png,
    make_patterned_ppm,
    media_dct_phash,
    media_near_dup_pairs,
    phash_image,
    resize_ppm,
)


def test_dct_basis_orthonormal_and_isolates_pure_cosine():
    T = _dct_basis_n(PHASH_INPUT)
    # orthonormality: T T^T = I
    assert np.allclose(T @ T.T, np.eye(PHASH_INPUT), atol=1e-12)
    # a pure 2D basis-product image concentrates in EXACTLY one coefficient
    n = PHASH_INPUT
    x = np.arange(n)
    img = np.outer(
        np.cos((2 * x + 1) * 3 * np.pi / (2 * n)),
        np.cos((2 * x + 1) * 5 * np.pi / (2 * n)),
    )
    C = T @ img @ T.T
    mask = np.zeros_like(C, dtype=bool)
    mask[3, 5] = True
    assert abs(C[3, 5]) > 1.0
    assert np.abs(C[~mask]).max() < 1e-10


def test_phash_invariant_under_recompress_rescale_brighten():
    base = make_patterned_ppm("phx", width=64, height=48)
    h0 = phash_image(base)
    px = decode_ppm(base)["pixels"]
    for variant in (
        encode_jpeg(px, quant=4),
        encode_jpeg(px, quant=8),
        encode_png(px),
        resize_ppm(base, 128, 96),
        resize_ppm(base, 32, 24),
        make_patterned_ppm("phx", width=64, height=48, brightness=7),
    ):
        assert bin(h0 ^ phash_image(variant)).count("1") <= 2
    for other in ("phy", "phz"):
        d = bin(
            h0 ^ phash_image(make_patterned_ppm(other, width=64, height=48))
        ).count("1")
        assert d >= 16


def test_measured_complementarity_on_degenerate_gradient():
    # A pure gradient IS a sum of a few DCT basis functions: 75% of the
    # low-frequency block is exactly zero, the median threshold rides
    # quantization noise, and pHash bits scatter under recompression —
    # while cell-mean aHash is exact.  This is the documented reason to
    # run BOTH hashes on mixed-content corpora.
    px = np.zeros((48, 64, 3), np.uint8)
    for y in range(48):
        for x in range(64):
            px[y, x] = ((2 * y + x) % 200 + 30, int(1.5 * x) % 180 + 40,
                        (x + y) % 160 + 50)
    base = encode_png(px)
    jpeg = encode_jpeg(px, quant=4)
    assert bin(ahash_image(base) ^ ahash_image(jpeg)).count("1") == 0
    assert bin(phash_image(base) ^ phash_image(jpeg)).count("1") > 8


def test_media_dct_phash_distributed_and_composes(spark):
    base = make_patterned_ppm("phd", width=64, height=48)
    items = [
        (1, base),
        (2, encode_jpeg(decode_ppm(base)["pixels"], quant=4)),
        (3, make_patterned_ppm("phd-other", width=64, height=48)),
    ]
    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in items], "media_id long, payload binary"
    )
    hashes = media_dct_phash(media)
    got = {r["media_id"]: r["ahash"] for r in hashes.collect()}
    for mid, p in items:
        v = phash_image(p)
        assert got[mid] == (v - (1 << 64) if v >= (1 << 63) else v)
    pairs = [
        (r["media_id_a"], r["media_id_b"])
        for r in media_near_dup_pairs(hashes, max_hamming=7, bands=8).collect()
    ]
    assert pairs == [(1, 2)]
