"""MERGE semantics tests (SURVEY.md §2.8): insert / update / unchanged /
guard / idempotence — the properties the reference gets from unique
indexes + one_or_none gates + updateFromDict change detection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcdb_spark.operators.merge import (
    cascade_delete,
    delete_where,
    latest_wins_dedupe,
    merge,
)

TS = dt.datetime(2022, 1, 1, 0, 0, 0)


def _tables(spark):
    current = spark.createDataFrame(
        [
            (1, "a", 10.0, "run0", TS),
            (2, "b", 20.0, "run0", TS),
        ],
        "k int, name string, v double, run_id string, last_update timestamp",
    )
    incoming = spark.createDataFrame(
        [
            (2, "b", 25.0),   # matched + changed -> update
            (3, "c", 30.0),   # new -> insert
            (1, "a", 10.0),   # matched + unchanged -> untouched
        ],
        "k int, name string, v double",
    )
    return current, incoming


def test_merge_insert_update_keep(spark):
    current, incoming = _tables(spark)
    out = merge(current, incoming, keys=["k"], run_id="run1", audit_ts=F.lit(TS)).orderBy("k")
    rows = out.collect()
    assert [(r["k"], r["name"], r["v"]) for r in rows] == [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0)]
    # audit stamped only on touched rows (dirty gate, process_storms.py:239-240)
    assert [r["run_id"] for r in rows] == ["run0", "run1", "run1"]


def test_merge_idempotent(spark):
    current, incoming = _tables(spark)
    once = merge(current, incoming, keys=["k"], run_id="run1", audit_ts=F.lit(TS))
    twice = merge(once, incoming, keys=["k"], run_id="run2", audit_ts=F.lit(TS))
    a = {(r["k"], r["name"], r["v"], r["run_id"]) for r in once.collect()}
    b = {(r["k"], r["name"], r["v"], r["run_id"]) for r in twice.collect()}
    # replaying the same batch must be a fixed point (including audit: no
    # row is dirty the second time, so run2 never sticks)
    assert a == b


def test_merge_null_safe_change_detection(spark):
    current = spark.createDataFrame([(1, None)], "k int, v double")
    inc_same = spark.createDataFrame([(1, None)], "k int, v double")
    inc_diff = spark.createDataFrame([(1, 5.0)], "k int, v double")
    cur2 = current.withColumn("run_id", F.lit("r0")).withColumn("last_update", F.lit(TS))
    same = merge(cur2, inc_same, keys=["k"], run_id="r1", audit_ts=F.lit(TS)).first()
    assert same["run_id"] == "r0"  # NULL == NULL -> unchanged
    diff = merge(cur2, inc_diff, keys=["k"], run_id="r1", audit_ts=F.lit(TS)).first()
    assert diff["run_id"] == "r1" and diff["v"] == 5.0


def test_merge_newer_end_date_guard(spark):
    # "newer end_date wins" (tcdb/etl/process_storms.py:136-139)
    current = spark.createDataFrame(
        [(1, dt.datetime(2022, 2, 1))], "k int, end_date timestamp"
    )
    stale = spark.createDataFrame(
        [(1, dt.datetime(2022, 1, 15))], "k int, end_date timestamp"
    )
    guard = F.col("inc.end_date") >= F.col("cur.end_date")
    out = merge(current, stale, keys=["k"], update_guards=guard).first()
    assert out["end_date"] == dt.datetime(2022, 2, 1)


def test_delete_where_and_cascade(spark):
    storms = spark.createDataFrame([(1, 95), (2, 5)], "storm_id int, nhc_number int")
    obs = spark.createDataFrame([(1, 10.0), (1, 11.0), (2, 12.0)], "storm_id int, v double")
    new_storms, children = cascade_delete(
        storms, {"obs": (obs, "storm_id")}, F.col("nhc_number") >= 90, "storm_id"
    )
    assert [r["storm_id"] for r in new_storms.collect()] == [2]
    assert [r["storm_id"] for r in children["obs"].collect()] == [2]

    kept = delete_where(storms, F.col("nhc_number") >= 90)
    assert [r["storm_id"] for r in kept.collect()] == [2]


def test_latest_wins_dedupe(spark):
    staged = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 1, "only")], "k int, version int, v string"
    )
    out = latest_wins_dedupe(staged, ["k"], ["version"]).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "new"), (2, "only")]


def test_update_guard_null_current_still_updates(spark):
    """A guard comparing against a NULL current column must not freeze the
    row: NULL guard -> update allowed (guards only BLOCK on a definite
    False, mirroring the reference's 'newer end_date wins' which never
    fires against a missing date)."""
    current = spark.createDataFrame(
        [(1, "a", 10.0, None, "run0", TS)],
        "k int, name string, v double, end_date timestamp, run_id string, last_update timestamp",
    )
    incoming = spark.createDataFrame(
        [(1, "a", 99.0, dt.datetime(2022, 6, 1))],
        "k int, name string, v double, end_date timestamp",
    )
    guard = F.col("inc.end_date") >= F.col("cur.end_date")
    out = merge(current, incoming, keys=["k"], run_id="run1", update_guards=guard).first()
    assert out["v"] == 99.0 and out["run_id"] == "run1"


def test_warehouse_time_travel(spark, tmp_path):
    """Old versions stay queryable: read(version=n) returns the exact
    pre-merge state after a later merge commits, and versions() lists
    every committed version."""
    import pytest

    from tcdb_spark.operators.merge import merge
    from tcdb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t0 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "storm_id long, wind double"
    )
    wh.write("observations", t0)
    incoming = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], "storm_id long, wind double"
    )
    merged = merge(wh.read("observations"), incoming, keys=["storm_id"], dedupe_incoming=False)
    wh.write("observations", merged)

    assert wh.versions("observations") == [1, 2]
    latest = {r["storm_id"]: r["wind"] for r in wh.read("observations").collect()}
    assert latest == {1: 10.0, 2: 99.0, 3: 30.0}
    v1 = {r["storm_id"]: r["wind"] for r in wh.read("observations", version=1).collect()}
    assert v1 == {1: 10.0, 2: 20.0}
    with pytest.raises(FileNotFoundError, match="no version"):
        wh.read("observations", version=5)


def test_merge_schema_evolution_off_raises(spark):
    import pytest

    from tcdb_spark.operators.merge import merge

    cur = spark.createDataFrame([(1, "a")], "id bigint, v string")
    inc = spark.createDataFrame([(1, "a", 9.0)], "id bigint, v string, extra double")
    with pytest.raises(ValueError, match="extra"):
        merge(cur, inc, ["id"])


def test_merge_schema_evolution_appends_column(spark):
    from tcdb_spark.operators.merge import merge

    cur = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    inc = spark.createDataFrame([(1, "a", 9.0), (3, "c", 7.0)], "id bigint, v string, extra double")
    out = merge(cur, inc, ["id"], schema_evolution=True)
    rows = {r.id: (r.v, r.extra) for r in out.collect()}
    # matched row 1: shared cols unchanged but the evolved value is a change
    assert rows[1] == ("a", 9.0)
    # untouched row 2: NULL for the evolved column
    assert rows[2] == ("b", None)
    # inserted row 3 carries its value
    assert rows[3] == ("c", 7.0)
    # replaying the same batch is a fixed point
    again = merge(out, inc, ["id"], schema_evolution=True)
    assert {r.id: (r.v, r.extra) for r in again.collect()} == rows


def test_merge_scoped_schema_evolution(spark, tmp_path):
    from tcdb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "storm_id bigint, wind double"
    )
    wh.write_bucketed("obs", base, ["storm_id"], n_buckets=4)
    inc = spark.createDataFrame(
        [(1, 99.0, "reanalysis")], "storm_id bigint, wind double, provenance string"
    )
    info = wh.merge_scoped("obs", inc, ["storm_id"], schema_evolution=True)
    assert info["carried_files"] > 0  # untouched buckets were not rewritten
    got = {r.storm_id: (r.wind, r.provenance) for r in wh.read("obs").collect()}
    assert got[1] == (99.0, "reanalysis")
    for sid in range(2, 9):
        assert got[sid] == (float(sid), None)  # carried files read NULL
    # a later batch WITHOUT the evolved column still merges (keeps values)
    inc2 = spark.createDataFrame([(1, 55.0)], "storm_id bigint, wind double")
    wh.merge_scoped("obs", inc2, ["storm_id"])
    got2 = {r.storm_id: (r.wind, r.provenance) for r in wh.read("obs").collect()}
    assert got2[1] == (55.0, "reanalysis")


def test_apply_cdc_semantics_and_replay(spark):
    from pyspark.sql import functions as F

    from tcdb_spark.operators.merge import apply_cdc

    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    feed = spark.createDataFrame(
        [
            (2, 1, "U", "b2"),   # update
            (3, 1, "U", "c2"),   # update...
            (3, 2, "D", None),   # ...then delete wins (higher seq)
            (4, 1, "I", "d"),    # insert new key
            (5, 1, "D", None),   # delete of a key we never had: no-op
            (1, 7, "U", "a2"),   # same key, same seq as a D below
            (1, 7, "D", None),   # tie -> destructive op wins
        ],
        ["k", "seq", "op", "v"],
    )
    out = {r["k"]: r["v"] for r in apply_cdc(cur, feed, keys=["k"]).collect()}
    assert out == {2: "b2", 4: "d"}

    # replaying the same feed over the applied table is a fixed point
    applied = apply_cdc(cur, feed, keys=["k"])
    again = {r["k"]: r["v"] for r in apply_cdc(applied, feed, keys=["k"]).collect()}
    assert again == out


def test_apply_cdc_soft_out_of_order_batches(spark):
    """Soft CDC must converge to the same table whichever order the
    batches arrive in — the guarantee the hard-delete form cannot give."""
    from pyspark.sql import functions as F

    from tcdb_spark.operators.merge import apply_cdc_soft, cdc_bootstrap, cdc_view

    cur = cdc_bootstrap(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    # true log order: seq1 U(k=1,a2), seq2 D(k=1), seq3 U(k=2,b2)
    b_early = spark.createDataFrame(
        [(1, 1, "U", "a2"), (3, 1, "I", "c")], ["k", "seq", "op", "v"]
    )
    b_late = spark.createDataFrame(
        [(1, 2, "D", None), (2, 3, "U", "b2")], ["k", "seq", "op", "v"]
    )

    in_order = apply_cdc_soft(apply_cdc_soft(cur, b_early, ["k"]), b_late, ["k"])
    reversed_ = apply_cdc_soft(apply_cdc_soft(cur, b_late, ["k"]), b_early, ["k"])

    want = {2: "b2", 3: "c"}  # k=1 deleted; stale U(k=1) must NOT resurrect
    assert {r["k"]: r["v"] for r in cdc_view(in_order).collect()} == want
    assert {r["k"]: r["v"] for r in cdc_view(reversed_).collect()} == want
    # tombstone retains the delete's sequence for future staleness checks
    dead = in_order.where(F.col("__deleted")).collect()
    assert [(r["k"], r["seq"]) for r in dead] == [(1, 2)]


def test_stream_cdc_apply_end_to_end(spark, tmp_path):
    from pyspark.sql import types as T

    from tcdb_spark.operators.merge import cdc_view
    from tcdb_spark.sources.warehouse import Warehouse
    from tcdb_spark.streaming.pipeline import stream_cdc_apply

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    feed_dir = str(tmp_path / "feed")
    # file 1 carries the LATER half of the log, file 2 the earlier half
    spark.createDataFrame(
        [(1, 2, "D", None), (2, 3, "U", "b2")], schema
    ).coalesce(1).write.parquet(feed_dir)
    spark.createDataFrame(
        [(1, 1, "U", "a1"), (2, 1, "I", "b"), (3, 1, "I", "c")], schema
    ).coalesce(1).write.mode("append").parquet(feed_dir)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = stream_cdc_apply(
        spark, feed_dir, wh, schema, "kv", ["k"], max_files_per_trigger=1
    )
    q.awaitTermination(120)

    out = {r["k"]: r["v"] for r in cdc_view(wh.read("kv")).collect()}
    assert out == {2: "b2", 3: "c"}
    assert len(wh.versions("kv")) >= 2  # one commit per non-empty batch


def test_merge_sync_deletes_unmatched_and_upserts(spark):
    from pyspark.sql import functions as F

    from tcdb_spark.operators.merge import merge_sync

    cur = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "tag", "v"]
    )
    inc = spark.createDataFrame([(2, 25), (4, 40)], ["k", "v"])
    got = {r["k"]: (r["tag"], r["v"]) for r in merge_sync(cur, inc, ["k"]).collect()}
    # 1 and 3 deleted (not matched by source), 2 updated keeping tag,
    # 4 inserted with NULL for the current-only column
    assert got == {2: ("b", 25), 4: (None, 40)}


def test_merge_sync_noop_feed_is_identity(spark):
    from tcdb_spark.operators.merge import merge_sync

    cur = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["k", "tag", "v"])
    inc = cur.select("k", "v")
    got = {r["k"]: (r["tag"], r["v"]) for r in merge_sync(cur, inc, ["k"]).collect()}
    assert got == {1: ("a", 10), 2: ("b", 20)}


def test_frame_diff_classification_and_null_safety(spark):
    from tcdb_spark.operators.merge import frame_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (5, "e")], ["k", "v"]
    )
    got = {r["k"]: r["change_type"] for r in frame_diff(old, new, ["k"]).collect()}
    # 1 unchanged (no row), 2 NULL->b update (null-safe), 3+4 deleted, 5 inserted
    assert got == {2: "update", 3: "delete", 4: "delete", 5: "insert"}


def test_frame_diff_identical_states_empty(spark):
    from tcdb_spark.operators.merge import frame_diff

    df = spark.createDataFrame([(1, "a", None), (2, "b", 5)], ["k", "v", "w"])
    assert frame_diff(df, df, ["k"]).count() == 0
