"""stream_bloom_screen: the streaming already-seen screen.  Verdicts
must equal the pure-Python Bloom reference replayed over the observed
epoch order; the state fold must be replay-IDEMPOTENT (full
re-delivery after checkpoint loss converges to the identical bitmap)
while the verdict table rides the epoch guard (re-delivery writes
nothing)."""

from __future__ import annotations

import hashlib
import shutil
import time

from pyspark.sql import types as T

from tcdb_spark.sources.warehouse import Warehouse
from tcdb_spark.streaming.pipeline import stream_bloom_screen

M_BITS, K = 4096, 3

SCHEMA = T.StructType([T.StructField("key", T.StringType())])


def _ref_positions(key: str) -> set[int]:
    out = set()
    for i in range(K):
        h = hashlib.md5(f"{key}|{i}".encode()).hexdigest()
        poly = 0
        for j in range(8):
            poly = poly * 131 + ord(h[j])
        out.add(poly % M_BITS)
    return out


def _feed(spark, d, batches):
    for i, keys in enumerate(batches):
        spark.createDataFrame([(k,) for k in keys], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        time.sleep(1.05)  # distinct mtimes keep the file-source order stable


def _run(spark, d, wh, ckpt):
    q = stream_bloom_screen(
        spark,
        str(d),
        wh,
        SCHEMA,
        m_bits=M_BITS,
        k=K,
        checkpoint_dir=str(ckpt),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert q.exception() is None


def _state_bits(wh) -> set[int]:
    return {
        r["word_idx"] * 64 + b
        for r in wh.read("bloom_state").collect()
        for b in range(64)
        if (r["word"] >> b) & 1
    }


def test_verdicts_match_reference_replay_and_state_is_idempotent(
    spark, tmp_path
):
    batches = [
        ["a", "b", "c"],
        ["b", "c", "d"],          # b, c are re-occurrences
        ["a", "e", "e", "f"],     # a re-occurs; duplicate e within batch
    ]
    d = tmp_path / "feed"
    _feed(spark, d, batches)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"
    _run(spark, d, wh, ckpt)

    verdicts = [
        (r["epoch_id"], r["key"], r["maybe_member"])
        for r in wh.read("bloom_verdicts").collect()
    ]
    # one verdict per DISTINCT key per epoch
    by_epoch: dict[int, dict[str, bool]] = {}
    for e, key, mm in verdicts:
        by_epoch.setdefault(e, {})[key] = mm
    assert sorted(len(v) for v in by_epoch.values()) == [3, 3, 3]

    # replay the reference over the OBSERVED epoch order (order-agnostic:
    # the verdict table itself records which keys landed in which epoch)
    member_pos: set[int] = set()
    for e in sorted(by_epoch):
        for key, mm in by_epoch[e].items():
            assert mm == (_ref_positions(key) <= member_pos), (e, key)
        for key in by_epoch[e]:
            member_pos |= _ref_positions(key)

    # re-occurrences were flagged somewhere in the stream
    flagged = {k for v in by_epoch.values() for k, mm in v.items() if mm}
    assert {"a", "b", "c"} <= flagged
    # state bitmap == reference positions of every key ever seen
    assert _state_bits(wh) == member_pos

    # FULL re-delivery: checkpoint loss replays every batch. The state
    # OR-fold must converge to the identical bitmap with no epoch
    # guard; the verdict table's guard must keep the original rows.
    state_v = wh.current_version("bloom_state")
    before_bits = _state_bits(wh)
    before_verdicts = sorted(verdicts)
    shutil.rmtree(ckpt)
    _run(spark, d, wh, tmp_path / "ckpt")
    assert _state_bits(wh) == before_bits
    assert (
        sorted(
            (r["epoch_id"], r["key"], r["maybe_member"])
            for r in wh.read("bloom_verdicts").collect()
        )
        == before_verdicts
    )
    # state versions advanced (re-writes happened) but content is fixed
    assert wh.current_version("bloom_state") > state_v


def test_screen_keeps_ingesting_after_recovery(spark, tmp_path):
    d = tmp_path / "feed"
    _feed(spark, d, [["x", "y"]])
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"
    _run(spark, d, wh, ckpt)
    # a later tick sees the earlier keys as maybe-seen
    _feed(spark, d, [["y", "z"]])
    _run(spark, d, wh, ckpt)
    rows = {
        (r["epoch_id"], r["key"]): r["maybe_member"]
        for r in wh.read("bloom_verdicts").collect()
    }
    later = max(e for e, _ in rows)
    assert rows[(later, "y")] is True
    assert rows[(later, "z")] == (_ref_positions("z") <= (
        _ref_positions("x") | _ref_positions("y")
    ))
