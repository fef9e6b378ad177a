"""Ensemble/syntrack operators, streaming pipelines, tcvitals, multimodal
plumbing (SURVEY.md §2.10/§2.12, §7 steps 5-6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcdb_spark.operators.aggregates import ensemble_mean
from tcdb_spark.operators.pivot import pivot_matrix
from tcdb_spark.operators.syntracks import (
    assign_tracks_to_invest,
    drop_empty_tracks,
    syntrack_steps,
)
from tcdb_spark.sources.mat_ensemble import fake_ensemble_df
from tcdb_spark.sources.multimodal import extract_features, frame_sample_plan
from tcdb_spark.sources.tcvitals import parse_tcvitals_lines

INIT = dt.datetime(2022, 9, 1, 0, 0, 0)


def test_drop_empty_tracks(spark):
    df = fake_ensemble_df(spark, n_ens=4, n_steps=3)
    kept = drop_empty_tracks(df)
    assert df.select("ensemble").distinct().count() == 4
    assert kept.select("ensemble").distinct().count() == 3  # all-NaN member dropped


def test_assign_tracks_to_invest(spark):
    tracks = fake_ensemble_df(spark, n_ens=6, n_steps=4)
    invests = spark.createDataFrame(
        [("ECMWF", INIT, 1, "INVEST-95L", 10.2, -40.2, INIT)],
        "model string, init timestamp, annual_id int, name string, lat double, lon double, valid timestamp",
    )
    out = assign_tracks_to_invest(drop_empty_tracks(tracks), invests)
    assigned = (
        out.where(F.col("annual_id") == 1).select("ensemble").distinct().collect()
    )
    # members 1..4 start within ~310nm of the invest -> all assigned;
    # member 0 was pre-assigned
    assert sorted(r["ensemble"] for r in assigned) == [0, 1, 2, 3, 4]
    assert out.where(F.col("annual_id") == 1).where(
        F.col("storm_name") == "INVEST-95L"
    ).count() > 0


def test_assign_tracks_distance_ramp(spark):
    # a track starting at hour 48 may be much farther away: ramp widens
    rows = []
    for i in range(4):
        h = 48 + i * 6
        rows.append(("EC", INIT, 1, 0, None, h, 20.0, -50.0 - i, 40.0, 1000.0))
    far_first_step = spark.createDataFrame(
        rows,
        "model string, init timestamp, ensemble int, annual_id int, storm_name string, "
        "hour int, lat double, lon double, wind double, mslp double",
    )
    invests = spark.createDataFrame(
        [("EC", INIT, 7, "INV", 10.0, -40.0, INIT + dt.timedelta(hours=48))],
        "model string, init timestamp, annual_id int, name string, lat double, lon double, valid timestamp",
    )
    # distance (20,-50)->(10,-40) is ~830nm: above the step-0 threshold
    # (310) but under the hour-48 ramped threshold (310 + 8*28.5 = 538)?
    # no — still above; use max_step to stretch the ramp so it passes.
    out = assign_tracks_to_invest(far_first_step, invests, max_step=60, step_hours=6)
    assert out.where(F.col("annual_id") == 7).count() == 4


def test_ensemble_mean_and_matrix(spark):
    df = drop_empty_tracks(fake_ensemble_df(spark, n_ens=4, n_steps=3))
    with_mean = ensemble_mean(
        df, ["model", "init"], "hour", ["lat", "lon", "wind", "mslp"],
        deterministic_member=-1, mean_label=9000,
    )
    m = with_mean.where((F.col("ensemble") == 9000) & (F.col("hour") == 0)).first()
    assert abs(m["lat"] - (10.0 + 10.5 + 11.0) / 3) < 1e-9
    mat = pivot_matrix(
        with_mean.where(F.col("ensemble") != 9000), "hour", "ensemble", [0, 1, 2], "wind"
    )
    assert mat.count() == 3 and set(mat.columns) == {"hour", "0", "1", "2"}


def test_syntrack_steps_rounding(spark):
    df = drop_empty_tracks(fake_ensemble_df(spark, n_ens=3, n_steps=2))
    steps = syntrack_steps(df)
    assert steps.where(F.col("hour") == 0).count() == 2
    assert dict(steps.dtypes)["mslp_mb"] == "double"
    assert steps.select("track_id").distinct().count() == 2


def test_streaming_windowed_counts(spark, tmp_path):
    from tcdb_spark.streaming.pipeline import stream_windowed_counts_to_memory

    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 2, 0), 10.0),
            (2, dt.datetime(2024, 1, 1, 5, 59), 5.0),
            (3, dt.datetime(2024, 1, 1, 6, 0), 2.0),
        ],
        "event_id long, ts timestamp, value double",
    )
    path = str(tmp_path / "events_stream")
    events.write.parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    q = stream_windowed_counts_to_memory(spark, stream, name="t_cycle_counts")
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM t_cycle_counts ORDER BY cycle_window").collect()
    assert [(r["n"], r["total_value"]) for r in out] == [(2, 15.0), (1, 2.0)]


def test_streaming_bdeck_ingest(spark, tmp_path):
    from tcdb_spark.plans.queries_atcf import BDECK_LINES
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import run_incremental

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "batch1.dat").write_text("\n".join(BDECK_LINES[:3]))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    now = F.lit("2022-09-26 12:00:00").cast("timestamp")

    run_incremental(spark, str(raw), wh, now=now)
    assert wh.read("storms").count() == 1

    # late-arriving second file: next tick picks up ONLY the new file
    (raw / "batch2.dat").write_text("\n".join(BDECK_LINES[3:]))
    run_incremental(spark, str(raw), wh, now=now)
    storms = wh.read("storms")
    assert storms.count() == 3
    # replay tick with nothing new -> no-op
    run_incremental(spark, str(raw), wh, now=now)
    assert wh.read("storms").count() == 3


def test_tcvitals_parse(spark):
    line = (
        "NHC 09L IAN 20220926 0600 251N 0740W 270 08 0996 1010 150 35 030 "
        "060 040 030 050 D -99 -99 -99 -99 72 265N 0755W -999 -999 -999 -999"
    )
    df = parse_tcvitals_lines(spark.createDataFrame([(line,)], "value string"))
    r = df.first()
    assert r["org"] == "NHC" and r["storm_name"] == "IAN"
    assert r["lat"] == 25.1 and r["lon"] == -74.0
    assert r["datetime_utc"] == dt.datetime(2022, 9, 26, 6, 0)
    assert r["mslp_mb"] == 996.0
    assert r["r50_ne_km"] is None  # -99 sentinel -> null
    assert r["r64_ne_km"] is None  # -999 sentinel -> null


def test_multimodal_features_and_frames(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(b"payload-one"), "image", 'png', None),
            (2, bytearray(b"payload-two"), "video", 'mp4', 3.5),
            (3, None, "image", 'png', None),
        ],
        "media_id long, payload binary, media_type string, format string, duration_s double",
    )
    feats = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id[1]["features"]) == 8
    assert all(0 <= v < 1 for v in by_id[1]["features"])
    assert by_id[3]["features"] is None and by_id[3]["n_bytes"] == 0
    # determinism (golden property of the stub)
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[1]["features"] == by_id[1]["features"]

    frames = frame_sample_plan(media, every_s=1.0)
    assert frames.where(F.col("media_id") == 2).count() == 4  # t=0,1,2,3


def test_streaming_session_windows_match_batch_twin(spark, tmp_path):
    """Native session_window sessions == batch sessionize sessions on the
    same data.  A far-future sentinel event advances the final watermark
    past every real session so append mode emits them all."""
    from tcdb_spark.operators.skew import sessionize
    from tcdb_spark.streaming.pipeline import stream_session_counts

    base = dt.datetime(2024, 1, 1, 0, 0)

    def at(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: [0, 10, 25] one session; [90, 95] a second (65-min gap)
        (1, at(0), 1.0), (1, at(10), 2.0), (1, at(25), 4.0),
        (1, at(90), 8.0), (1, at(95), 16.0),
        # user 2: single-event session
        (2, at(5), 100.0),
        # watermark sentinel, excluded from assertions
        (99, at(60 * 24 * 30), 0.0),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path / "sess_events")
    events.write.parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    q = (
        stream_session_counts(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # availableNow finalizes the watermark on a follow-up empty batch;
    # the memory table is complete once the query terminates
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_sessions WHERE user_id <> 99").collect()
    }
    assert got == {(1, 3, 7.0), (1, 2, 24.0), (2, 1, 100.0)}

    batch = sessionize(
        events.where(F.col("user_id") != 99), ["user_id"], "ts", gap_minutes=30.0
    )
    twin = {
        (r.user_id, r.n, r.v)
        for r in batch.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == twin


def test_streaming_span_dedup_matches_one_shot(spark, tmp_path):
    """File-source stream with per-file micro-batches: the appended
    span log equals one-shot duplicated_spans over the full corpus,
    and the index holds each hash exactly once."""
    from tcdb_spark.operators.spans import duplicated_spans
    from tcdb_spark.streaming.pipeline import stream_span_dedup

    shared = " ".join(f"s{i}" for i in range(12))
    b1 = [(1, "a b " + shared + " c d"), (2, " ".join(f"x{i}" for i in range(20)))]
    b2 = [(10, "e f g " + shared + " h"), (11, " ".join(f"x{i}" for i in range(20)))]
    src = tmp_path / "docs_src"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = stream_span_dedup(
        stream,
        index_path=str(tmp_path / "span_idx"),
        spans_path=str(tmp_path / "span_log"),
        checkpoint=str(tmp_path / "ckpt"),
        w=10,
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(str(tmp_path / "span_log")).collect()
    }
    full = spark.createDataFrame(b1 + b2, schema).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    )
    oneshot = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(full, w=10).collect()
    }
    assert got == oneshot and len(got) >= 2  # doc 10 vs corpus, doc 11 vs 2

    idx = spark.read.parquet(str(tmp_path / "span_idx"))
    assert idx.count() == idx.select("h").distinct().count()


def test_stream_hist_crash_between_commits_replays_idempotently(spark, tmp_path):
    """The torn-transaction window of every foreachBatch sink: the
    warehouse version commits, then the process dies BEFORE the stream
    checkpoint commits the epoch. On restart Spark re-delivers the same
    epoch — the state table's epoch guard must skip re-folding it (a
    histogram fold is NOT idempotent), leaving exactly one application,
    and the pipeline must keep ingesting normally afterwards."""
    from pyspark.sql import types as T

    from tcdb_spark.operators.sketch import hist_partials
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_hist_quantiles

    schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("x", T.LongType())]
    )
    d = tmp_path / "docs"
    rows1 = [("a", i % 64) for i in range(400)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d))

    crash_flag = tmp_path / "crashed_once"

    class CrashAfterCommit(Warehouse):
        """Commits for real, then dies — once."""

        def write(self, table, df, **kw):
            v = super().write(table, df, **kw)
            if not crash_flag.exists():
                crash_flag.write_text("armed")
                raise RuntimeError(
                    "injected crash: warehouse committed, checkpoint NOT"
                )
            return v

    ckpt = str(tmp_path / "ckpt")
    args = dict(lo=0.0, hi=64.0, n_bins=16, checkpoint_dir=ckpt)
    q = stream_hist_quantiles(
        spark, str(d), CrashAfterCommit(spark, str(tmp_path / "wh")),
        schema, "x", ["src"], **args,
    )
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    assert crash_flag.exists()

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.current_version("hist_state") == 1  # the commit DID land

    # restart from the same checkpoint: epoch 0 is re-delivered; the
    # guard must skip it — no double fold, no new version
    q2 = stream_hist_quantiles(spark, str(d), wh, schema, "x", ["src"], **args)
    q2.awaitTermination(120)
    assert q2.exception() is None
    assert wh.current_version("hist_state") == 1

    def state_counts():
        return {
            (r["src"], r["bin"]): r["cnt"]
            for r in wh.read("hist_state").select("src", "bin", "cnt").collect()
        }

    def want_counts(rows):
        return {
            (r["src"], r["bin"]): r["cnt"]
            for r in hist_partials(
                spark.createDataFrame(rows, schema), "x", ["src"], 0.0, 64.0, 16
            ).collect()
        }

    assert state_counts() == want_counts(rows1)

    # and the recovered pipeline keeps ingesting: a second tick folds in
    rows2 = [("a", 32 + i % 32) for i in range(200)]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    q3 = stream_hist_quantiles(spark, str(d), wh, schema, "x", ["src"], **args)
    q3.awaitTermination(120)
    assert q3.exception() is None
    assert wh.current_version("hist_state") == 2
    assert state_counts() == want_counts(rows1 + rows2)


def test_stream_hist_quantiles_state_equals_one_shot(spark, tmp_path):
    """Streaming histogram-state maintenance must converge to exactly
    the partials a one-shot batch pass computes, and quantiles read
    from the state must match the batch sketch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tcdb_spark.operators.sketch import hist_partials, hist_quantile
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_hist_quantiles

    schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("x", T.LongType())]
    )
    d = tmp_path / "docs"
    rows1 = [("a", i % 100) for i in range(500)] + [("b", i % 37) for i in range(300)]
    rows2 = [("a", 50 + i % 200) for i in range(400)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = stream_hist_quantiles(
        spark, str(d), wh, schema, "x", ["src"], lo=0.0, hi=256.0, n_bins=32
    )
    q.awaitTermination(120)

    state = wh.read("hist_state")
    got = {
        (r["src"], r["bin"]): r["cnt"]
        for r in state.select("src", "bin", "cnt").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r["src"], r["bin"]): r["cnt"]
        for r in hist_partials(batch, "x", ["src"], 0.0, 256.0, 32).collect()
    }
    assert got == want

    qs_state = {
        (r["src"], r["q"]): r["est"]
        for r in hist_quantile(
            state.select("src", "bin", "cnt"), ["src"], [0.5, 0.99], 0.0, 256.0, 32
        ).collect()
    }
    qs_batch = {
        (r["src"], r["q"]): r["est"]
        for r in hist_quantile(
            hist_partials(batch, "x", ["src"], 0.0, 256.0, 32),
            ["src"], [0.5, 0.99], 0.0, 256.0, 32,
        ).collect()
    }
    assert qs_state == qs_batch


def test_stream_psi_drift_matches_batch(spark, tmp_path):
    """Streaming PSI monitor: per-batch fixed-edge bin counts fold into
    the state table by SUM across two file drops, the folded state
    equals the one-shot batch count matrix exactly (integer merges),
    and psi_from_counts over it separates a drifted cohort from a
    healthy one (leave-one-out contract)."""
    from pyspark.sql import types as T

    from tcdb_spark.plans.queries_analytics import psi_from_counts
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import psi_bin_counts, stream_psi_drift

    schema = T.StructType(
        [T.StructField("cohort", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    d = tmp_path / "feed"
    # nine healthy cohorts dominate the pool; one small shifted cohort
    rows1 = [(f"s{k}", float(i % 100)) for k in range(9) for i in range(300)]
    rows2 = [(f"s{k}", float(i % 100)) for k in range(9) for i in range(200)] + [
        ("shifted", 200.0 + float(i % 50)) for i in range(60)
    ]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    args = dict(lo=0.0, hi=256.0, bins=16, checkpoint_dir=str(tmp_path / "ckpt"))
    q = stream_psi_drift(spark, str(d), wh, schema, "cohort", "x", **args)
    q.awaitTermination(120)
    assert q.exception() is None

    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    q2 = stream_psi_drift(spark, str(d), wh, schema, "cohort", "x", **args)
    q2.awaitTermination(120)
    assert q2.exception() is None

    state = wh.read("psi_state").drop("__epoch")
    all_rows = spark.createDataFrame(rows1 + rows2, schema)
    want = psi_bin_counts(all_rows, "cohort", "x", 0.0, 256.0, 16)
    got = {r["cohort"]: r.asDict() for r in state.collect()}
    for r in want.collect():
        assert got[r["cohort"]] == r.asDict()  # exact integer merge

    psi = {r["cohort"]: r["psi"] for r in psi_from_counts(state, "cohort").collect()}
    assert psi["s0"] < 0.1 < 0.25 < psi["shifted"]
    assert abs(psi["s0"] - psi["s8"]) < 1e-12


def test_stream_ks_drift_matches_batch(spark, tmp_path):
    """Streaming KS monitor: bin counts fold across two file drops into
    the shared PSI/KS state matrix; ks_from_counts over the folded state
    equals the one-shot batch computation EXACTLY (integer state, shared
    read-out expression) and separates the shifted cohort."""
    import pytest
    from pyspark.sql import types as T

    from tcdb_spark.plans.queries_stats import ks_from_counts
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import psi_bin_counts, stream_ks_drift

    schema = T.StructType(
        [T.StructField("cohort", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    d = tmp_path / "feed"
    rows1 = [(f"s{k}", float(i % 100)) for k in range(4) for i in range(150)]
    rows2 = [(f"s{k}", float(i % 100)) for k in range(4) for i in range(100)] + [
        ("shifted", 200.0 + float(i % 50)) for i in range(80)
    ]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    args = dict(lo=0.0, hi=256.0, bins=16, checkpoint_dir=str(tmp_path / "ckpt"))
    q = stream_ks_drift(spark, str(d), wh, schema, "cohort", "x", **args)
    q.awaitTermination(120)
    assert q.exception() is None

    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    q2 = stream_ks_drift(spark, str(d), wh, schema, "cohort", "x", **args)
    q2.awaitTermination(120)
    assert q2.exception() is None

    state = wh.read("ks_state").drop("__epoch")
    all_rows = spark.createDataFrame(rows1 + rows2, schema)
    batch_state = psi_bin_counts(all_rows, "cohort", "x", 0.0, 256.0, 16)
    got = {r["cohort"]: r for r in ks_from_counts(state, "cohort", 16).collect()}
    want = {r["cohort"]: r for r in ks_from_counts(batch_state, "cohort", 16).collect()}
    assert set(got) == set(want)
    for cohort in want:
        assert got[cohort]["n_cohort"] == want[cohort]["n_cohort"]
        assert got[cohort]["ks_d"] == want[cohort]["ks_d"]  # exact integer state
    # disjoint support -> D = 1 for the shifted cohort; healthy ~ equal
    assert got["shifted"]["ks_d"] == pytest.approx(1.0)
    assert got["s0"]["ks_d"] < 0.4


def test_psi_bin_counts_excludes_nulls_from_n(spark):
    """NULL values get no bin, so they must not count into n either —
    sum(c0..c15) must equal n exactly, or every smoothed q_i is biased
    low for cohorts with NULLs (the batch ECDF lanes filter NULLs; the
    streaming state must match)."""
    from tcdb_spark.streaming.pipeline import psi_bin_counts

    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("b", None), ("b", 5.0)],
        "cohort string, x double",
    )
    rows = {r["cohort"]: r for r in psi_bin_counts(df, "cohort", "x", 0.0, 256.0, 16).collect()}
    for cohort, n_want in (("a", 2.0), ("b", 1.0)):
        r = rows[cohort]
        assert r["n"] == n_want
        assert sum(r[f"c{i}"] for i in range(16)) == r["n"]


def test_stream_distinct_hll_replay_is_idempotent_without_epoch_guard(spark, tmp_path):
    """HLL state fold is a per-register max, so the torn-transaction
    replay that REQUIRES the epoch guard on additive folds is a no-op
    here by construction: crash after the warehouse commit, restart,
    re-deliver the epoch — the re-union leaves the estimates identical
    to the one-shot batch sketch.  Also checks incremental folding of a
    second file batch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_distinct_hll

    schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("uid", T.LongType())]
    )
    d = tmp_path / "events"
    rows1 = [("a", i % 37) for i in range(200)] + [("b", i % 11) for i in range(50)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d))

    crash_flag = tmp_path / "crashed_once"

    class CrashAfterCommit(Warehouse):
        def write(self, table, df, **kw):
            v = super().write(table, df, **kw)
            if not crash_flag.exists():
                crash_flag.write_text("armed")
                raise RuntimeError("injected crash: committed, checkpoint NOT")
            return v

    ckpt = str(tmp_path / "ckpt_hll")
    q = stream_distinct_hll(
        spark, str(d), CrashAfterCommit(spark, str(tmp_path / "whh")),
        schema, "uid", ["src"], checkpoint_dir=ckpt,
    )
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)

    wh = Warehouse(spark, str(tmp_path / "whh"))
    assert wh.current_version("hll_state") == 1

    # restart: epoch 0 re-delivered, re-unioned — state may re-commit
    # (v2) but the ESTIMATES must not move (idempotent fold)
    q2 = stream_distinct_hll(spark, str(d), wh, schema, "uid", ["src"], checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert q2.exception() is None

    def estimates():
        return {
            r["src"]: r["e"]
            for r in wh.read("hll_state")
            .select("src", F.hll_sketch_estimate("sk").alias("e"))
            .collect()
        }

    assert estimates() == {"a": 37, "b": 11}

    # a second landed file folds in incrementally
    rows2 = [("a", 1000 + i) for i in range(13)]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    q3 = stream_distinct_hll(spark, str(d), wh, schema, "uid", ["src"], checkpoint_dir=ckpt)
    q3.awaitTermination(120)
    assert q3.exception() is None
    assert estimates() == {"a": 50, "b": 11}
