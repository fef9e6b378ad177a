"""Bloom-filter membership (operators/bloom.py) vs a pure-Python
reference implementation of the same md5 hex-polynomial positions:
no false negatives ever, verdicts (including false positives) exactly
equal to the reference, bitmap-vs-position-set equivalence, bitmap
size bound, and the broadcast probe plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tcdb_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_build,
    bloom_probe,
    bloom_probe_inline,
)


def _ref_position(key: str, i: int, m_bits: int = BLOOM_M_BITS) -> int:
    h = hashlib.md5(f"{key}|{i}".encode()).hexdigest()
    poly = 0
    for j in range(8):
        poly = poly * 131 + ord(h[j])
    return poly % m_bits


def _ref_positions(key: str, k: int = BLOOM_K) -> set[int]:
    return {_ref_position(key, i) for i in range(k)}


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_bitmap_equals_reference_position_set(spark):
    members = [f"member-{i}" for i in range(200)]
    words = {
        r["word_idx"]: r["word"]
        for r in bloom_build(_keys_df(spark, members)).collect()
    }
    # bit set in a word  <=>  position in the reference set
    expected = set()
    for m in members:
        expected |= _ref_positions(m)
    got = {
        w * 64 + b
        for w, word in words.items()
        for b in range(64)
        if (word >> b) & 1
    }
    assert got == expected
    assert len(words) <= BLOOM_M_BITS // 64


def test_no_false_negatives_and_verdicts_match_reference(spark):
    members = [f"blocked-{i}" for i in range(150)]
    probes = members[:50] + [f"clean-{i}" for i in range(500)]
    bloom = bloom_build(_keys_df(spark, members))
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(_keys_df(spark, probes), bloom).collect()
    }
    member_pos = set()
    for m in members:
        member_pos |= _ref_positions(m)
    for p in probes:
        expected = _ref_positions(p) <= member_pos
        assert got[p] == expected, p
        if p in members:
            assert got[p] is True  # no false negatives, ever


def test_inline_probe_matches_join_form_and_never_shuffles_probe(spark):
    """The zero-regroup projection probe (round 8): verdicts must be
    bit-identical to bloom_probe's per-key regroup on every key class —
    members, non-members, duplicate keys (each occurrence verdicted
    identically), and NULL keys (maybe_member false, row preserved) —
    and the probe side must reach the verdict without a single
    shuffle exchange."""
    members = [f"blocked-{i}" for i in range(120)]
    probes = members[:40] + [f"clean-{i}" for i in range(300)]
    bloom = bloom_build(_keys_df(spark, members))
    join_form = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(_keys_df(spark, probes), bloom).collect()
    }
    # duplicates + a NULL key ride along on a wide row
    rows = [(i, p) for i, p in enumerate(probes + probes[:25])] + [(9999, None)]
    wide = spark.createDataFrame(rows, "row_id int, key string")
    inline = bloom_probe_inline(wide, bloom).collect()
    assert len(inline) == len(rows)  # every probe row emitted
    for r in inline:
        if r["key"] is None:
            assert r["maybe_member"] is False
        else:
            assert r["maybe_member"] == join_form[r["key"]], r["key"]
    # plan shape: no Exchange anywhere except the broadcast of the
    # bitmap words (the build side's own aggregation exchange sits
    # below the broadcast, never on the probe rows)
    plan = bloom_probe_inline(wide, bloom)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            # the only allowed shuffle is INSIDE the broadcast subtree
            # (bloom_build's word aggregation); reaching one on the
            # probe path would put "Exchange hashpartitioning(row_id"
            # or "(key" in the plan
            assert "row_id" not in line and "(key" not in line, line


def test_false_positive_exists_and_is_deterministic(spark):
    # With a saturated filter (m_bits=64) every probe collides — the
    # degenerate case must still be deterministic and all-maybe.
    members = [f"m-{i}" for i in range(300)]
    bloom = bloom_build(_keys_df(spark, members), m_bits=64, k=2)
    verdicts = bloom_probe(
        _keys_df(spark, ["definitely-not-a-member"]), bloom, m_bits=64, k=2
    ).collect()
    assert verdicts[0]["maybe_member"] is True


def test_probe_plan_broadcasts_bitmap_not_members(spark):
    bloom = bloom_build(_keys_df(spark, [f"m-{i}" for i in range(50)]))
    plan = (
        bloom_probe(_keys_df(spark, ["a", "b"]), bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_member_set_rejects_everything(spark):
    empty = _keys_df(spark, []).select(
        F.col("key"),
    )
    bloom = bloom_build(empty)
    got = bloom_probe(_keys_df(spark, ["x", "y"]), bloom).collect()
    assert all(r["maybe_member"] is False for r in got)


def test_packed_probe_equals_join_form_and_never_shuffles(spark):
    from tcdb_spark.operators.bloom import bloom_pack, bloom_probe_packed

    members = [f"m-{i}" for i in range(120)]
    probes = members[:40] + [f"q-{i}" for i in range(300)]
    bloom = bloom_build(_keys_df(spark, members))
    packed = bloom_pack(bloom)
    assert isinstance(packed, bytes) and len(packed) == BLOOM_M_BITS // 8
    join_form = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(_keys_df(spark, probes), bloom).collect()
    }
    out = bloom_probe_packed(_keys_df(spark, probes), packed)
    got = {r["key"]: r["maybe_member"] for r in out.collect()}
    assert got == join_form
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_pack_bit_layout_matches_reference(spark):
    from tcdb_spark.operators.bloom import bloom_pack

    members = [f"layout-{i}" for i in range(64)]
    packed = bloom_pack(bloom_build(_keys_df(spark, members)))
    expected = set()
    for m in members:
        expected |= _ref_positions(m)
    got = {
        i * 8 + b
        for i, byte in enumerate(packed)
        for b in range(8)
        if (byte >> b) & 1
    }
    assert got == expected


def test_pack_guard_rejects_oversized_bitmap(spark):
    import pytest

    from tcdb_spark.operators.bloom import bloom_pack

    with pytest.raises(ValueError, match="16 MiB"):
        bloom_pack(bloom_build(_keys_df(spark, ["x"]), m_bits=1 << 40), m_bits=1 << 40)

def test_packed_probe_null_key_matches_sparse_twin(spark):
    """NULL probe keys must not fail the task (ADVICE r7): both probe
    forms emit the row with a NULL verdict — the sparse twin's natural
    three-valued outcome (null positions miss the word join; the
    hit-sum over zero non-null rows is null)."""
    from tcdb_spark.operators.bloom import bloom_pack, bloom_probe_packed

    members = [f"n-{i}" for i in range(50)]
    bloom = bloom_build(_keys_df(spark, members))
    probes = spark.createDataFrame(
        [("n-1",), (None,), ("q-absent",), (None,)], "key string"
    )
    sparse = {
        r["key"]: r["maybe_member"] for r in bloom_probe(probes, bloom).collect()
    }
    packed_rows = bloom_probe_packed(probes, bloom_pack(bloom)).collect()
    assert len(packed_rows) == 4  # every probe row emitted, nulls included
    packed = {r["key"]: r["maybe_member"] for r in packed_rows}
    assert sparse == packed
    assert packed["n-1"] is True
    assert packed[None] is None

def test_fpr_tracks_closed_form_bound(spark):
    """Hash-quality attestation (round-8 lane bloom_fpr_attest): the
    observed FPR on a disjoint probe set must sit within binomial noise
    of (1-e^{-kn/m})^k.  A positional-entropy regression (e.g. a
    truncated hex polynomial capping the position set) blows the
    observed rate far past the bound — something sparse/packed verdict
    equality can never catch since both share _position."""
    from tcdb_spark.plans.queries_curation import bloom_fpr_attest

    row = bloom_fpr_attest(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_probes"] == 2000
    expected = row["bound_bp"] / 10000.0 * row["n_probes"]
    # 3-sigma binomial window around the bound (sigma = sqrt(np(1-p)))
    sigma = (expected * (1 - row["bound_bp"] / 10000.0)) ** 0.5
    assert abs(row["n_fp"] - expected) <= 3 * sigma + 1, (row["n_fp"], expected)
