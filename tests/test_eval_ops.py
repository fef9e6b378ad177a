"""Evaluation operators: retrieval metrics, calibration bins, and the
perceptual-hash media near-dup lane (hand-computable cases + banded-join
vs all-pairs equivalence)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_retrieval_eval_closed_form(spark):
    """One query, 5 candidates, k=3: ranks by score desc are
    c1(rel) c2 c3(rel) c4(rel) c5 -> P@3 = 2/3, MRR = 1, nDCG@3 with
    rels [1,0,1] against ideal [1,1,1] (n_rel=3 >= 3)."""
    from tcdb_spark.operators.evalmetrics import retrieval_eval

    cands = spark.createDataFrame(
        [
            (7, 1, 1, 0.9),
            (7, 2, 0, 0.8),
            (7, 3, 1, 0.7),
            (7, 4, 1, 0.6),
            (7, 5, 0, 0.5),
        ],
        "q_id int, vec_id int, rel int, score double",
    )
    row = retrieval_eval(cands, k=3).collect()[0]
    assert row["n_rel"] == 3
    assert abs(row["p_at_3"] - 2 / 3) < 1e-12
    assert row["mrr"] == 1.0
    dcg = 1 / math.log2(2) + 0 + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(row["ndcg_at_3"] - round(dcg / idcg, 6)) < 1e-9


def test_retrieval_eval_no_relevant_in_topk(spark):
    """MRR is 0 when no relevant candidate makes top-k; nDCG is 0 too
    (empty DCG over a nonzero ideal — n_rel counts ALL candidates)."""
    from tcdb_spark.operators.evalmetrics import retrieval_eval

    cands = spark.createDataFrame(
        [(1, 10, 0, 0.9), (1, 11, 0, 0.8), (1, 12, 1, 0.1)],
        "q_id int, vec_id int, rel int, score double",
    )
    row = retrieval_eval(cands, k=2).collect()[0]
    assert row["mrr"] == 0.0
    assert row["p_at_2"] == 0.0
    assert row["ndcg_at_2"] == 0.0
    assert row["n_rel"] == 1


def test_retrieval_eval_degenerate_inputs(spark):
    """Arbitrary ANN/hybrid output hits both degenerate shapes routinely:
    a query with ZERO relevant candidates (IDCG = 0) must yield
    nDCG = NULL — not a 0/0 DIVIDE_BY_ZERO crash under the ANSI default;
    a query with FEWER than k candidates must coalesce the missing
    rel_i slots to 0 so P@k and nDCG come back numeric, not NULL."""
    from tcdb_spark.operators.evalmetrics import retrieval_eval

    cands = spark.createDataFrame(
        [
            # q=1: no relevant candidates at all -> n_rel = 0
            (1, 10, 0, 0.9),
            (1, 11, 0, 0.8),
            # q=2: only 2 candidates for k=3, first one relevant
            (2, 20, 1, 0.9),
            (2, 21, 0, 0.8),
        ],
        "q_id int, vec_id int, rel int, score double",
    )
    rows = {r["q_id"]: r for r in retrieval_eval(cands, k=3).collect()}
    q1, q2 = rows[1], rows[2]
    assert q1["n_rel"] == 0
    assert q1["p_at_3"] == 0.0
    assert q1["mrr"] == 0.0
    assert q1["ndcg_at_3"] is None  # undefined, not a crash and not 0
    assert q2["n_rel"] == 1
    assert abs(q2["p_at_3"] - 1 / 3) < 1e-12
    assert q2["mrr"] == 1.0
    # DCG = 1/log2(2) from rank 1; IDCG = 1/log2(2) (n_rel = 1)
    assert q2["ndcg_at_3"] == 1.0


def test_calibration_bins_and_clamp(spark):
    """Counts/rates per bin, and out-of-range scores clamp to the edge
    bins instead of vanishing or binning negative."""
    from tcdb_spark.operators.evalmetrics import calibration

    scored = spark.createDataFrame(
        [
            (1, 0.95),   # bin 15
            (0, 0.95),   # bin 15
            (1, 0.95),   # bin 15
            (0, -0.95),  # bin 0
            (1, 1.5),    # clamps to 15
            (0, -1.5),   # clamps to 0
        ],
        "pos int, score double",
    )
    out = {r["bin"]: r for r in calibration(scored, bins=16).collect()}
    assert set(out) == {0, 15}
    assert out[15]["n"] == 4 and out[15]["positives"] == 3
    assert out[0]["n"] == 2 and out[0]["positives"] == 0
    assert out[15]["pos_rate"] == 0.75
    assert out[0]["pos_rate"] == 0.0


def test_ahash_brightness_invariant_and_sensitive():
    from tcdb_spark.sources.multimodal import ahash_ppm, make_patterned_ppm

    base = ahash_ppm(make_patterned_ppm("t1"))
    assert ahash_ppm(make_patterned_ppm("t1", brightness=20)) == base
    flipped = ahash_ppm(make_patterned_ppm("t1", flip_cells=((2, 2),)))
    assert bin(base ^ flipped).count("1") == 1


def test_media_near_dup_banded_equals_all_pairs(spark):
    """The banded Hamming equi-join reproduces the naive all-pairs
    popcount exactly for max_hamming < bands (pigeonhole), on a 12-image
    set with planted duplicates at several distances."""
    from tcdb_spark.sources.multimodal import (
        ahash_ppm,
        make_patterned_ppm,
        media_ahash,
        media_near_dup_pairs,
    )

    images = [(i, make_patterned_ppm(f"s{i % 7}", flip_cells=tuple(
        (j, j) for j in range(i // 7)
    ))) for i in range(1, 13)]
    expected = set()
    hashes = {mid: ahash_ppm(p) for mid, p in images}
    for i, (a, _) in enumerate(images):
        for b, _ in images[i + 1 :]:
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= 7:
                expected.add((a, b, h))
    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in images],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in media_near_dup_pairs(media_ahash(media), 7, 8).collect()
    }
    assert got == expected
    assert expected  # fixture must actually contain near-dups


def test_media_near_dup_threshold_guard(spark):
    from tcdb_spark.sources.multimodal import media_near_dup_pairs

    hashes = spark.createDataFrame([(1, 5)], "media_id long, ahash long")
    with pytest.raises(ValueError, match="max_hamming < bands"):
        media_near_dup_pairs(hashes, max_hamming=8, bands=8)


def test_engine_eval_facades(spark, tmp_path):
    from tcdb_spark.api import Engine
    from tcdb_spark.sources.multimodal import make_patterned_ppm

    eng = Engine(spark, str(tmp_path / "wh"))
    cands = spark.createDataFrame(
        [(1, 1, 1, 0.9), (1, 2, 0, 0.8)], "q_id int, vec_id int, rel int, score double"
    )
    assert eng.retrieval_eval(cands, k=2).collect()[0]["mrr"] == 1.0
    scored = spark.createDataFrame([(1, 0.9), (0, -0.9)], "pos int, score double")
    assert eng.calibration(scored).count() == 2
    media = spark.createDataFrame(
        [
            (1, bytearray(make_patterned_ppm("e1"))),
            (2, bytearray(make_patterned_ppm("e1", brightness=4))),
            (3, bytearray(make_patterned_ppm("e2"))),
        ],
        "media_id long, payload binary",
    )
    pairs = eng.media_near_dup(media).collect()
    assert [(p["media_id_a"], p["media_id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]

    # decode/resize/resample facades route by magic bytes across formats
    from tcdb_spark.sources.multimodal import (
        decode_flac,
        decode_png,
        decode_ppm,
        encode_flac,
        encode_png,
        make_test_wav,
    )
    import numpy as np

    png = encode_png(decode_ppm(make_patterned_ppm("eng1"))["pixels"])
    flac = encode_flac(np.linspace(-0.5, 0.5, 400)[:, None])
    mixed = spark.createDataFrame(
        [(1, bytearray(png), "image"), (2, bytearray(make_test_wav()), "audio"),
         (3, bytearray(flac), "audio")],
        "media_id long, payload binary, media_type string",
    )
    feats = {r["media_id"]: r["features"] for r in eng.media_features(mixed).collect()}
    assert feats[1][0] == 32.0  # real PNG width
    assert feats[2][0] == 8000.0 and feats[3][0] == 8000.0  # WAV + FLAC rates
    small = eng.media_resize(mixed, 8, 6).collect()
    png_small = [r for r in small if r["media_id"] == 1][0]
    assert decode_png(bytes(png_small["payload"]))["width"] == 8
    res = {r["media_id"]: r for r in eng.media_resample(mixed, 4000).collect()}
    assert decode_flac(bytes(res[3]["payload"]))["sample_rate"] == 4000
