"""Validation operator tests + streaming watermark late-data semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tcdb_spark.operators.validation import (
    PRESSURE,
    RangeRule,
    VELOCITY,
    assert_valid,
    check_range_coerce,
    check_range_strict,
    observed_violations,
)


def test_check_range_modes(spark):
    df = spark.createDataFrame(
        [(1, 999.0, 50.0), (2, 400.0, 50.0), (3, None, 300.0), (4, 0.0, 0.0)],
        "id int, mslp_mb double, intensity_kts double",
    )
    strict = check_range_strict(df, [PRESSURE, VELOCITY])
    assert strict == {"mslp_mb": 1, "intensity_kts": 1}

    coerced = {r["id"]: (r["mslp_mb"], r["intensity_kts"]) for r in
               check_range_coerce(df, [PRESSURE, VELOCITY]).collect()}
    assert coerced[1] == (999.0, 50.0)
    assert coerced[2][0] == 1000.0          # out of range -> default
    assert coerced[3] == (1000.0, None)     # None -> default; 300 kt -> null
    assert coerced[4] == (0.0, 0.0)         # 0 mb explicitly allowed

    with pytest.raises(ValueError, match="mslp_mb"):
        assert_valid(df, [PRESSURE])


def test_observed_violations_piggyback(spark):
    df = spark.createDataFrame(
        [(i, float(i * 100)) for i in range(6)], "id int, intensity_kts double"
    )
    out, obs = observed_violations(df, [VELOCITY])
    # the observation rides the consumer's own action — no second scan
    assert out.count() == 6
    assert obs.get == {"bad_intensity_kts": 3}  # 300, 400, 500


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg across two AvailableNow restarts: an
    event arriving behind the watermark must NOT reopen its finalized
    window (SURVEY.md §2.10 late-data contract; 48h analog is the
    reference's re-write skip window)."""
    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    src.mkdir()
    t = dt.datetime(2024, 1, 1, 10, 0)

    def run_batch():
        schema = "event_id long, ts timestamp, value double"
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [
        (1, t, 1.0),
        (2, t + dt.timedelta(minutes=10), 1.0),
        (3, t + dt.timedelta(hours=3), 1.0),   # advances watermark to 12:00
    ]
    spark.createDataFrame(batch1, "event_id long, ts timestamp, value double").write.mode(
        "append"
    ).parquet(str(src))
    run_batch()
    first = {str(r["w_start"]): r["n"] for r in spark.read.parquet(out_dir).collect()}
    assert first.get("2024-01-01 10:00:00") == 2  # finalized with 2 events

    # batch 2: one event 2h behind the watermark (dropped), one fresh
    batch2 = [
        (4, t + dt.timedelta(minutes=5), 1.0),     # LATE -> dropped
        (5, t + dt.timedelta(hours=6), 1.0),       # advances watermark further
    ]
    spark.createDataFrame(batch2, "event_id long, ts timestamp, value double").write.mode(
        "append"
    ).parquet(str(src))
    run_batch()
    final = {}
    for r in spark.read.parquet(out_dir).collect():
        final[str(r["w_start"])] = final.get(str(r["w_start"]), 0) + r["n"]
    # the 10:00 window was NOT re-emitted or incremented by the late event
    assert final["2024-01-01 10:00:00"] == 2
    # the 13:00 window (batch1 event 3) got finalized by the new watermark
    assert final.get("2024-01-01 13:00:00") == 1


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: re-delivered events within the
    watermark horizon are dropped across micro-batch restarts, first
    arrival wins — the streaming ledger of §2.8 dedup-file-content."""
    from tcdb_spark.streaming.pipeline import stream_dedup_events

    src = tmp_path / "dedup_src"
    ckpt = str(tmp_path / "dedup_ckpt")
    out_dir = str(tmp_path / "dedup_out")
    src.mkdir()
    t = dt.datetime(2024, 1, 1, 10, 0)
    schema = "event_id long, ts timestamp, value double"

    def run_batch():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_dedup_events(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [
        (1, t, 1.0),
        (1, t, 99.0),                       # in-batch duplicate -> dropped
        (2, t + dt.timedelta(minutes=10), 2.0),
        (3, t + dt.timedelta(hours=3), 3.0),
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(str(src))
    run_batch()
    got = {r["event_id"]: r["value"] for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {1, 2, 3} and got[1] == 1.0  # first arrival won

    batch2 = [
        (3, t + dt.timedelta(hours=3), 33.0),   # re-delivery within horizon -> dropped
        (4, t + dt.timedelta(hours=3, minutes=30), 4.0),
    ]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(str(src))
    run_batch()
    rows = spark.read.parquet(out_dir).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4]  # event 3 NOT duplicated, event 4 appended


def test_stream_corpus_curation_two_ticks(spark, tmp_path):
    """Streaming curation twin: quality/lang gates per batch, exact
    dedup ACROSS ticks (dropDuplicatesWithinWatermark on content hash),
    MERGE into the warehouse - a re-delivered duplicate text in tick 2
    must not create a second corpus row."""
    import json as _json

    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_corpus_curation

    src = tmp_path / "landing"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    good = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens

    def tick(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        q = stream_corpus_curation(
            spark, str(src), wh, checkpoint_dir=str(tmp_path / "ckpt"), min_tokens=5
        )
        q.awaitTermination(120)

    tick(
        "b1.json",
        [
            {"doc_id": 1, "lang": "en", "source": "web", "text": good, "ts": "2024-01-01T10:00:00"},
            {"doc_id": 2, "lang": "en", "source": "web", "text": "too short", "ts": "2024-01-01T10:00:00"},
            {"doc_id": 3, "lang": "zz", "source": "web", "text": good + " other", "ts": "2024-01-01T10:00:00"},
        ],
    )
    first = wh.read("corpus").collect()
    assert {r["doc_id"] for r in first} == {1}  # quality + lang gates

    tick(
        "b2.json",
        [
            # same TEXT, new doc_id: cross-tick duplicate, must not land
            {"doc_id": 9, "lang": "en", "source": "web", "text": good, "ts": "2024-01-01T11:00:00"},
            {"doc_id": 4, "lang": "es", "source": "web", "text": good + " nueva", "ts": "2024-01-01T11:00:00"},
        ],
    )
    final = {r["doc_id"]: r for r in wh.read("corpus").collect()}
    assert set(final) == {1, 4}
    assert final[1]["text"] == good  # original kept, re-delivery ignored
    assert wh.versions("corpus") == [1, 2]


def test_stream_stream_join_inner_and_outer(spark, tmp_path):
    """Watermarked stream-stream join: inner matches pair within the
    time tolerance; left-outer emits an unmatched left row with null
    right columns only after the watermark proves no match can come."""
    from tcdb_spark.streaming.pipeline import stream_stream_join

    lsrc, rsrc = tmp_path / "l_src", tmp_path / "r_src"
    lsrc.mkdir(), rsrc.mkdir()
    t = dt.datetime(2024, 1, 1, 12, 0)
    lschema = "storm_id long, obs_ts timestamp, wind double"
    rschema = "storm_id long, fix_ts timestamp, model string"

    def run(how, ckpt, out):
        lstream = spark.readStream.schema(lschema).parquet(str(lsrc))
        rstream = spark.readStream.schema(rschema).parquet(str(rsrc))
        j = stream_stream_join(
            lstream, rstream, key="storm_id", left_ts="obs_ts", right_ts="fix_ts",
            tolerance="30 minutes", watermark="1 hour", how=how,
        )
        q = (
            j.writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    lbatch = [
        (1, t, 50.0),                                 # matches fix at 12:10
        (2, t + dt.timedelta(minutes=5), 60.0),       # no fix -> outer-only row
        (3, t + dt.timedelta(minutes=10), 70.0),      # fix exists but 2h away -> no match
    ]
    rbatch = [
        (1, t + dt.timedelta(minutes=10), "HWRF"),
        (3, t + dt.timedelta(hours=2), "GFS"),
    ]
    spark.createDataFrame(lbatch, lschema).write.mode("append").parquet(str(lsrc))
    spark.createDataFrame(rbatch, rschema).write.mode("append").parquet(str(rsrc))

    inner_out = str(tmp_path / "inner_out")
    run("inner", str(tmp_path / "inner_ckpt"), inner_out)
    inner = spark.read.parquet(inner_out).collect()
    assert {(r["storm_id"], r["model"]) for r in inner} == {(1, "HWRF")}
    assert inner[0]["wind"] == 50.0 and inner[0]["fix_ts"] is not None

    outer_out = str(tmp_path / "outer_out")
    run("left", str(tmp_path / "outer_ckpt"), outer_out)
    matched = {r["storm_id"] for r in spark.read.parquet(outer_out).collect() if r["model"]}
    assert matched == {1}
    # unmatched rows may not emit yet: watermark hasn't passed their horizon

    # batch 2 far in the future advances both watermarks past batch 1
    spark.createDataFrame(
        [(9, t + dt.timedelta(hours=10), 1.0)], lschema
    ).write.mode("append").parquet(str(lsrc))
    spark.createDataFrame(
        [(9, t + dt.timedelta(hours=10), "OFCL")], rschema
    ).write.mode("append").parquet(str(rsrc))
    run("left", str(tmp_path / "outer_ckpt"), outer_out)
    rows = spark.read.parquet(outer_out).collect()
    nulls = {r["storm_id"] for r in rows if r["model"] is None}
    assert nulls == {2, 3}, rows  # unmatched left rows emitted with null right side
    assert {r["storm_id"] for r in rows if r["model"]} >= {1, 9}

    # misuse guard: overlapping non-key columns rejected
    import pytest
    with pytest.raises(ValueError, match="rename overlapping"):
        stream_stream_join(
            spark.readStream.schema(lschema).parquet(str(lsrc)),
            spark.readStream.schema(lschema).parquet(str(lsrc)),
            key="storm_id", left_ts="obs_ts", right_ts="obs_ts",
        )


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a micro-batch stream enriched by a static
    dim joins without watermarks or stream-side state (the dim is just
    re-read per batch; broadcast keeps it off the shuffle path) — the
    streaming twin of join-dim-enrich."""
    src = tmp_path / "ss_src"
    src.mkdir()
    dim = spark.createDataFrame(
        [(0, "sensor"), (1, "manual")], "event_type long, type_name string"
    )
    t = dt.datetime(2024, 1, 1, 10, 0)
    schema = "event_id long, ts timestamp, event_type long"
    spark.createDataFrame(
        [(1, t, 0), (2, t, 1), (3, t, 99)], schema
    ).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    enriched = stream.join(F.broadcast(dim), "event_type", "left")
    out = str(tmp_path / "ss_out")
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["type_name"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "sensor", 2: "manual", 3: None}
