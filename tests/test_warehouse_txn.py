"""Multi-table atomic commit (Warehouse.transaction) — the engine twin
of the reference's one-MySQL-transaction-per-file semantics
(tcdb/etl/atcf_forecasts.py:51,136; ORM cascade session
tcdb/models/storms.py:30-31).

The crash-injection tests patch ``os.replace`` to fail exactly at the
snapshot swap — the single commit point — and prove readers see either
every table advance or none (VERDICT r3 item 3).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tcdb_spark.sources.warehouse import Warehouse


def _counts(wh: Warehouse, tables):
    return {t: wh.read(t).count() if wh.exists(t) else None for t in tables}


@pytest.fixture()
def wh2(spark, tmp_path):
    """Warehouse with two committed single-version tables."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("parent", spark.range(10).withColumnRenamed("id", "pk"))
    wh.write("child", spark.range(30).withColumn("pk", F.col("id") % 10))
    return wh


def _fail_snapshot_swap(monkeypatch):
    """os.replace that dies exactly at the snapshot commit point."""
    real = os.replace

    def boom(src, dst, *a, **kw):
        if str(dst).endswith("_SNAPSHOT.json"):
            raise OSError("injected crash at snapshot swap")
        return real(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", boom)


def test_txn_commit_moves_all_tables_together(spark, wh2):
    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
        txn.write("child", spark.range(15).withColumn("pk", F.col("id") % 5))
    assert _counts(wh2, ["parent", "child"]) == {"parent": 5, "child": 15}
    assert wh2.current_version("parent") == 2
    assert wh2.current_version("child") == 2
    # a FRESH warehouse instance (new process analog) resolves the same
    fresh = Warehouse(spark, wh2.root)
    assert _counts(fresh, ["parent", "child"]) == {"parent": 5, "child": 15}


def test_txn_crash_at_commit_point_leaves_all_tables_old(spark, wh2, monkeypatch):
    before = _counts(wh2, ["parent", "child"])
    _fail_snapshot_swap(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        with wh2.transaction(["parent", "child"]) as txn:
            txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
            txn.write("child", spark.range(15).withColumn("pk", F.col("id") % 5))
    # NEITHER table moved: the staged v=2 dirs exist but nothing a reader
    # resolves points at them
    monkeypatch.undo()
    assert _counts(wh2, ["parent", "child"]) == before
    assert wh2.current_version("parent") == 1
    assert wh2.current_version("child") == 1
    # locks were released: the retry commits cleanly and both move together
    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
        txn.write("child", spark.range(15).withColumn("pk", F.col("id") % 5))
    assert _counts(wh2, ["parent", "child"]) == {"parent": 5, "child": 15}


def test_txn_error_rolls_back_staged_versions(spark, wh2):
    with pytest.raises(RuntimeError, match="mid-txn failure"):
        with wh2.transaction(["parent", "child"]) as txn:
            txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
            raise RuntimeError("mid-txn failure")
    assert _counts(wh2, ["parent", "child"]) == {"parent": 10, "child": 30}
    # the staged parent v=2 dir was cleaned up, not left as an orphan
    assert wh2.versions("parent") == [1]


def test_txn_read_your_own_writes(spark, wh2):
    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(7).withColumnRenamed("id", "pk"))
        staged = txn.read("parent")
        assert staged.count() == 7  # staged version, not the committed 10
        assert wh2.read("parent").count() == 10  # outside readers: committed
        txn.write("child", staged.withColumn("fk", F.col("pk")))
    assert _counts(wh2, ["parent", "child"]) == {"parent": 7, "child": 7}


def test_single_table_writes_keep_snapshot_fresh(spark, wh2):
    # bootstrap the snapshot via a txn, then a plain write must publish
    # through it (a stale overlay would shadow the new version)
    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
        txn.write("child", spark.range(15).withColumn("pk", F.col("id") % 5))
    wh2.write("parent", spark.range(3).withColumnRenamed("id", "pk"))
    assert wh2.current_version("parent") == 3
    assert wh2.read("parent").count() == 3
    fresh = Warehouse(spark, wh2.root)
    assert fresh.read("parent").count() == 3


def test_adeck_job_crash_cannot_orphan_children(spark, tmp_path, monkeypatch):
    """The 3-level forecast->track->step ingest survives a crash at the
    commit point with ALL THREE tables at their prior state."""
    from tcdb_spark.jobs.adeck import run_adeck_job
    from tcdb_spark.jobs.bdeck import run_bdeck_job
    from tcdb_spark.plans.queries_atcf import BDECK_LINES
    from tcdb_spark.sources.atcf import parse_adeck_lines, parse_bdeck_lines

    wh = Warehouse(spark, str(tmp_path / "wh"))
    now = F.lit("2022-09-26 12:00:00").cast("timestamp")
    bdeck = spark.createDataFrame([(l,) for l in BDECK_LINES], "value string")
    run_bdeck_job(spark, parse_bdeck_lines(bdeck), wh, "B__1", now=now)

    adeck_lines = [
        "AL, 09, 2022092600, 01, OFCL, 0, 251N, 740W, 35, 1003, TS, 34, NEQ, 60, 40, 30, 50, x",
        "AL, 09, 2022092600, 01, OFCL, 12, 258N, 748W, 45, 998, TS, 34, NEQ, 70, 50, 40, 60, x",
    ]
    adeck = parse_adeck_lines(
        spark.createDataFrame([(l,) for l in adeck_lines], "value string")
    )
    tables = ["forecasts", "tracks", "steps"]

    _fail_snapshot_swap(monkeypatch)
    with pytest.raises(OSError, match="injected crash"):
        run_adeck_job(spark, adeck, wh, "A__1")
    monkeypatch.undo()
    # neither: no table exists (first ingest never became visible)
    assert _counts(wh, tables) == {t: None for t in tables}

    # replay commits all three together — both, never a partial hierarchy
    run_adeck_job(spark, adeck, wh, "A__2")
    got = _counts(wh, tables)
    assert got["forecasts"] == 1 and got["tracks"] == 1 and got["steps"] == 2


def test_concurrent_transactions_cannot_interleave(spark, wh2):
    """Two transactions over overlapping table sets: the second fails
    fast with ConcurrentWriteError at lock acquisition (sorted-order
    locking — no deadlock, no partial interleave), and the first
    commits untouched."""
    from tcdb_spark.sources.warehouse import ConcurrentWriteError

    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(5).withColumnRenamed("id", "pk"))
        with pytest.raises(ConcurrentWriteError, match="locked by another writer"):
            with wh2.transaction(["child", "parent"]):
                pass
        # a single-table writer racing a txn-held table also fails fast
        with pytest.raises(ConcurrentWriteError, match="locked by another writer"):
            wh2.write("child", spark.range(1).withColumnRenamed("id", "pk"))
        txn.write("child", spark.range(15).withColumn("pk", F.col("id") % 5))
    assert _counts(wh2, ["parent", "child"]) == {"parent": 5, "child": 15}
    # locks fully released after commit
    wh2.write("child", spark.range(3).withColumn("pk", F.col("id")))
    assert wh2.read("child").count() == 3


def test_randomized_commit_walk_stays_consistent(spark, tmp_path):
    """Seeded random walk over the commit surface (plain writes,
    multi-table transactions, failed transactions, restores, vacuums)
    with a driver-side model of expected table contents.  The invariant
    after every step: each table reads back exactly the row count the
    model says was last committed, and a fresh Warehouse instance (new
    process analog) agrees — i.e. the snapshot overlay and the pointer
    caches can never disagree about current state, no matter how
    commits interleave."""
    import random

    rng = random.Random(42)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tables = ["alpha", "beta", "gamma"]
    model: dict[str, int] = {}  # table -> expected row count
    history: dict[str, list[tuple[int, int]]] = {t: [] for t in tables}  # (version, count)

    def df_of(n):
        return spark.range(n).withColumnRenamed("id", "k")

    for step in range(24):
        op = rng.choice(["write", "txn", "failed_txn", "restore", "vacuum"])
        if op == "write":
            t = rng.choice(tables)
            n = rng.randint(1, 50)
            v = wh.write(t, df_of(n))
            model[t] = n
            history[t].append((v, n))
        elif op == "txn":
            ts = rng.sample(tables, rng.randint(2, 3))
            ns = {t: rng.randint(1, 50) for t in ts}
            with wh.transaction(ts) as txn:
                for t in ts:
                    v = txn.write(t, df_of(ns[t]))
                    history[t].append((v, ns[t]))
            model.update(ns)
        elif op == "failed_txn":
            ts = rng.sample(tables, 2)
            try:
                with wh.transaction(ts) as txn:
                    txn.write(ts[0], df_of(rng.randint(1, 50)))
                    raise RuntimeError("walk-injected failure")
            except RuntimeError:
                pass  # model unchanged: nothing became visible
            history[ts[0]] = [
                (v, n) for v, n in history[ts[0]] if v in set(wh.versions(ts[0]))
            ]
        elif op == "restore" and model:
            t = rng.choice([t for t in tables if t in model])
            live = [
                (v, n) for v, n in history[t] if v in set(wh.versions(t))
            ]
            if live:
                v_src, n_src = rng.choice(live)
                v_new = wh.restore(t, v_src)
                model[t] = n_src
                history[t].append((v_new, n_src))
        elif op == "vacuum" and model:
            t = rng.choice([t for t in tables if t in model])
            wh.vacuum(t, keep_last=rng.randint(1, 3))

        for t, n in model.items():
            assert wh.read(t).count() == n, (step, op, t)
        fresh = Warehouse(spark, wh.root)
        for t, n in model.items():
            assert fresh.read(t).count() == n, (step, op, t, "fresh")


def test_snapshot_publish_has_no_lost_updates(spark, wh2):
    """Hammer _publish from 8 threads over disjoint tables: the
    snapshot's read-modify-write under _SNAPLOCK must lose no update —
    after the storm, the snapshot holds every thread's final version
    and agrees with the pointer caches.  (Threads share nothing but the
    filesystem, same as separate processes — the lock is O_EXCL.)"""
    import threading

    # bootstrap the snapshot
    with wh2.transaction(["parent", "child"]) as txn:
        txn.write("parent", spark.range(1).withColumnRenamed("id", "pk"))
        txn.write("child", spark.range(1).withColumnRenamed("id", "pk"))

    n_threads, n_rounds = 8, 25
    errors = []

    def worker(i):
        try:
            for v in range(1, n_rounds + 1):
                wh2._publish({f"tbl{i}": v})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    snap = wh2._read_snapshot()
    for i in range(n_threads):
        assert snap[f"tbl{i}"] == n_rounds, (i, snap.get(f"tbl{i}"))
        assert wh2._pointer_version(f"tbl{i}") == n_rounds
    # the transactional tables' entries survived the storm untouched
    assert snap["parent"] == wh2.current_version("parent")
    assert snap["child"] == wh2.current_version("child")
