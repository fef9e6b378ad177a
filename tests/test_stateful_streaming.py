"""applyInPandasWithState lifecycle operator test: drive a streaming
query over staged parquet micro-batches and observe transition events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcdb_spark.streaming.stateful import storm_lifecycle_stream

SCHEMA = (
    "nhc_id string, nhc_number int, datetime_utc timestamp, intensity_kts double"
)


def test_storm_lifecycle_stream(spark, tmp_path):
    t0 = dt.datetime(2022, 9, 24, 0, 0)

    batch = [
        # invest appears, later upgraded to named (same nhc_id track key
        # after entity resolution), and intensifies
        ("AL092022", 95, t0, 25.0),
        ("AL092022", 95, t0 + dt.timedelta(hours=6), 30.0),
        ("AL092022", 9, t0 + dt.timedelta(hours=12), 40.0),
        ("AL092022", 9, t0 + dt.timedelta(hours=18), 55.0),
        # a named storm with steady winds: genesis only
        ("EP052022", 5, t0, 50.0),
        ("EP052022", 5, t0 + dt.timedelta(hours=6), 55.0),
    ]
    src = tmp_path / "obs_stream"
    spark.createDataFrame(batch, SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    out = storm_lifecycle_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lifecycle")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM lifecycle ORDER BY nhc_id, at").collect()
    by_storm = {}
    for r in rows:
        by_storm.setdefault(r["nhc_id"], []).append(r["event"])
    assert by_storm["AL092022"][0] == "genesis"
    assert "invest_upgraded" in by_storm["AL092022"]
    assert "intensified" in by_storm["AL092022"]  # 25 -> 40+ jump
    assert by_storm["EP052022"] == ["genesis"]


def test_stream_embedding_index_incremental(spark, tmp_path):
    """Two embedding drops -> one queryable ANN index: each batch is
    assigned to the fixed quantizer's buckets inside the stream
    (ivf_assign) and MERGEd; a search after tick 2 finds a tick-2
    vector, and re-delivered vec_ids do not duplicate."""
    import json as _json

    from pyspark.sql import functions as F

    from tcdb_spark.operators.similarity import ivf_build, ivf_search
    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_embedding_index

    sf = "/root/testdata/sf0.001"
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    _, centroids = ivf_build(e, k_centroids=8, seed=42)
    rows = e.select("vec_id", F.col("embedding").cast("array<double>")).collect()

    src = tmp_path / "landing"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def drop(name, batch):
        with open(src / name, "w") as fh:
            for r in batch:
                fh.write(_json.dumps({"vec_id": r["vec_id"], "embedding": list(r["embedding"])}) + "\n")
        q = stream_embedding_index(
            spark, str(src), wh, centroids, checkpoint_dir=str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    drop("b1.json", rows[:100])
    assert wh.read("ann_index").count() == 100
    drop("b2.json", rows[90:150])  # 10 re-delivered + 50 new
    idx = wh.read("ann_index")
    assert idx.count() == 150  # idempotent on vec_id

    probe = rows[120]
    q = spark.createDataFrame(
        [(999_999, list(probe["embedding"]))], "q_id long, q_emb array<double>"
    )
    hits = ivf_search(idx, centroids, q, k=1, nprobe=2).collect()
    assert hits and hits[0]["vec_id"] == probe["vec_id"]


def test_running_peak_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas: ValueState folds across two staged
    micro-batches; the second batch's emission reflects state from the
    first (n_obs and peak accumulate, not reset). Skips (with the gate
    asserted actionable) when the image lacks protobuf — the state
    server's wire format."""
    import pytest

    from tcdb_spark.streaming.stateful import (
        running_peak_stream,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        src_stream = spark.readStream.format("rate").load()
        with pytest.raises(NotImplementedError, match="protobuf"):
            running_peak_stream(src_stream.withColumnRenamed("value", "nhc_id"))
        pytest.skip("protobuf not in image: transformWithState gated")

    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        t0 = dt.datetime(2022, 9, 24, 0, 0)
        src = tmp_path / "obs_tws"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt_tws")
        b1 = [
            ("AL092022", 95, t0, 25.0),
            ("AL092022", 95, t0 + dt.timedelta(hours=6), 30.0),
            ("EP052022", 5, t0, 50.0),
        ]
        b2 = [
            ("AL092022", 9, t0 + dt.timedelta(hours=12), 45.0),
            ("EP052022", 5, t0 + dt.timedelta(hours=6), 40.0),
        ]
        schema = spark.createDataFrame(b1, SCHEMA).schema

        # foreachBatch, not the memory sink: restarting from a
        # checkpoint is only supported for fault-tolerant sinks, and
        # tick 2 IS a restart (same checkpointLocation, new query) —
        # the memory sink throws "does not support recovering from
        # checkpoint location" on it
        emitted: list = []

        def sink(batch_df, _epoch_id):
            emitted.extend(batch_df.collect())

        def run_tick(rows, tick):
            emitted.clear()
            spark.createDataFrame(rows, SCHEMA).write.parquet(
                str(src / f"tick={tick}")
            )
            stream = spark.readStream.schema(schema).option(
                "recursiveFileLookup", "true"
            ).parquet(str(src))
            q = (
                running_peak_stream(stream)
                .writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {r["nhc_id"]: (r["n_obs"], r["peak"]) for r in emitted}

        first = run_tick(b1, 1)
        assert first["AL092022"] == (2, 30.0)
        assert first["EP052022"] == (1, 50.0)

        second = run_tick(b2, 2)
        # state survived the restart via the checkpoint: counts/peaks fold
        assert second["AL092022"] == (3, 45.0)
        assert second["EP052022"] == (2, 50.0)   # peak keeps batch-1 max
    finally:
        # DEVNOTES #26: unset when the key was never explicitly set
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)


def test_storm_silence_timer_stream(spark, tmp_path):
    """transformWithStateInPandas EVENT-TIME timers end-to-end, no
    wall-clock dependence: tick 1 arms per-key silence deadlines
    (last_seen + 6h) for two storms; AL keeps reporting in ticks 2-3,
    advancing the watermark past EP's deadline while re-arming its own.
    EP must emit exactly one went_silent row carrying its last_seen/
    peak state; AL must never alarm (input rows are processed before
    expired timers, so the re-arm wins).  Exercises RegisterTimer/
    DeleteTimer/ListTimers/ExpiryTimerRequest through the protobuf
    runtime (the running-peak test covers only the value-state
    protocol family)."""
    from tcdb_spark.streaming.stateful import (
        storm_silence_stream,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("no protobuf runtime (vendor tree stripped)")

    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        t0 = dt.datetime(2022, 9, 24, 0, 0)
        src = tmp_path / "obs_silence"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt_silence")
        b1 = [
            ("AL092022", 95, t0, 25.0),
            ("EP052022", 5, t0, 50.0),
        ]
        # AL keeps reporting; EP goes quiet after t0.  Deadlines are
        # last_seen + 6h; tick 2 moves the watermark to t0+12h (past
        # EP's t0+6h, boundary-free) but a batch fires timers against
        # its STARTING watermark, so the alarm lands in tick 3.
        b2 = [("AL092022", 9, t0 + dt.timedelta(hours=12), 45.0)]
        b3 = [("AL092022", 9, t0 + dt.timedelta(hours=24), 60.0)]
        schema = spark.createDataFrame(b1, SCHEMA).schema
        emitted: list = []

        def sink(batch_df, _epoch_id):
            emitted.extend(batch_df.collect())

        def run_tick(rows, tick):
            spark.createDataFrame(rows, SCHEMA).write.parquet(
                str(src / f"tick={tick}")
            )
            stream = spark.readStream.schema(schema).option(
                "recursiveFileLookup", "true"
            ).parquet(str(src))
            q = (
                storm_silence_stream(stream, silence_ms=6 * 3600 * 1000)
                .writeStream.outputMode("append")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_tick(b1, 1)
        assert emitted == []  # watermark still behind every deadline
        run_tick(b2, 2)
        run_tick(b3, 3)
        alarms = {r["nhc_id"]: r for r in emitted}
        assert set(alarms) == {"EP052022"}, alarms
        a = alarms["EP052022"]
        assert a["event"] == "went_silent"
        assert a["peak"] == 50.0
        assert a["last_seen"] == t0
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
