"""SCD Type-2 operator unit tests: close-out/insert semantics,
idempotence, null-safe change detection, multi-snapshot chains, as-of
views."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcdb_spark.operators.scd import scd2_as_of, scd2_init, scd2_merge

D1, D2, D3 = "2024-01-01", "2024-02-01", "2024-03-01"


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


def _hist_map(df):
    return {
        (r["k"], r["attr"], r["is_current"]): (r["effective_from"], r["effective_to"])
        for r in df.collect()
    }


def test_change_closes_and_inserts(spark):
    h = scd2_init(_snap(spark, [(1, "a"), (2, "b")]), D1)
    h2 = scd2_merge(h, _snap(spark, [(1, "a"), (2, "c")]), ["k"], ["attr"], D2)
    rows = {(r["k"], r["attr"], r["is_current"]) for r in h2.collect()}
    assert rows == {
        (1, "a", True),      # unchanged: untouched
        (2, "b", False),     # changed: predecessor closed
        (2, "c", True),      # changed: new open version
    }
    closed = h2.where(~F.col("is_current")).first()
    assert str(closed["effective_to"]).startswith("2024-02-01")


def test_idempotent_and_absent_keys_untouched(spark):
    h = scd2_init(_snap(spark, [(1, "a"), (2, "b")]), D1)
    h2 = scd2_merge(h, _snap(spark, [(1, "a"), (2, "b")]), ["k"], ["attr"], D2)
    assert _hist_map(h2) == _hist_map(h)
    # snapshot missing key 2 entirely: row 2 passes through open
    h3 = scd2_merge(h, _snap(spark, [(1, "a")]), ["k"], ["attr"], D2)
    assert _hist_map(h3) == _hist_map(h)


def test_null_safe_change_detection(spark):
    h = scd2_init(_snap(spark, [(1, None), (2, "x")]), D1)
    # NULL -> NULL is no change; "x" -> NULL is a change
    h2 = scd2_merge(h, _snap(spark, [(1, None), (2, None)]), ["k"], ["attr"], D2)
    rows = {(r["k"], r["attr"], r["is_current"]) for r in h2.collect()}
    assert rows == {(1, None, True), (2, "x", False), (2, None, True)}


def test_new_key_and_three_snapshot_chain(spark):
    h = scd2_init(_snap(spark, [(1, "a")]), D1)
    h = scd2_merge(h, _snap(spark, [(1, "b"), (9, "new")]), ["k"], ["attr"], D2)
    h = scd2_merge(h, _snap(spark, [(1, "c"), (9, "new")]), ["k"], ["attr"], D3)
    hist = _hist_map(h)
    assert len(hist) == 4  # 1: a->b->c (3 rows), 9: new (1 row)
    assert (1, "c", True) in hist and (9, "new", True) in hist
    # version chain for key 1 tiles the timeline without gaps
    k1 = sorted(
        ((r["effective_from"], r["effective_to"]) for r in h.where("k = 1").collect()),
    )
    assert k1[0][1] == k1[1][0] and k1[1][1] == k1[2][0] and k1[2][1] is None


def test_as_of_views(spark):
    h = scd2_init(_snap(spark, [(1, "a")]), D1)
    h = scd2_merge(h, _snap(spark, [(1, "b")]), ["k"], ["attr"], D2)
    assert scd2_as_of(h, D1).first()["attr"] == "a"
    assert scd2_as_of(h, "2024-01-15").first()["attr"] == "a"
    assert scd2_as_of(h, D2).first()["attr"] == "b"
    assert scd2_as_of(h, "2023-12-31").count() == 0


def test_stream_scd2_dim_two_ticks(spark, tmp_path):
    """Streaming SCD2: snapshot files drain through foreachBatch into
    the versioned history table; a multi-snapshot backlog applies in
    timestamp order and equals tick-at-a-time processing."""
    import datetime as dt

    from pyspark.sql import types as T

    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_scd2_dim

    src = tmp_path / "snaps"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("attr", T.StringType()),
            T.StructField("snapshot_ts", T.TimestampType()),
        ]
    )
    t1 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 2, 1)
    t3 = dt.datetime(2024, 3, 1)

    def tick():
        q = stream_scd2_dim(
            spark, str(src), wh, schema, key=["k"], tracked=["attr"],
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    # tick 1: a backlog holding TWO snapshots (t1 init, t2 change)
    spark.createDataFrame(
        [(1, "a", t1), (2, "b", t1), (1, "a2", t2), (2, "b", t2)], schema
    ).write.mode("append").parquet(str(src))
    tick()
    hist = {(r["k"], r["attr"], r["is_current"]) for r in wh.read("dim_history").collect()}
    assert hist == {(1, "a", False), (1, "a2", True), (2, "b", True)}

    # tick 2: one more snapshot; key 2 changes, key 1 unchanged
    spark.createDataFrame([(1, "a2", t3), (2, "b3", t3)], schema).write.mode(
        "append"
    ).parquet(str(src))
    tick()
    hist = {(r["k"], r["attr"], r["is_current"]) for r in wh.read("dim_history").collect()}
    assert hist == {
        (1, "a", False), (1, "a2", True),
        (2, "b", False), (2, "b3", True),
    }
    # warehouse keeps a version per applied snapshot (time travel intact)
    assert wh.current_version("dim_history") == 3
