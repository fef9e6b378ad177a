"""REAL concurrent-writer contention through the warehouse CAS lock
(VERDICT r5 #6): N separate processes — each with its own SparkSession
and JVM, synchronized to start together — run optimistic
read-merge-write loops against ONE table.  Asserts:

- no lost updates: the final value per key equals the total number of
  committed increments;
- serializable history: every intermediate version v holds exactly
  (v - 1) increments (each commit is derived from the version it CASed
  against, so the version chain IS the serial order);
- the lock/CAS retry path actually fired under contention (total
  retries > 0 — the barrier start makes collisions near-certain, and a
  zero-retry run would mean the test exercised nothing).

The crash-injection tests (test_warehouse_txn.py) cover atomicity at
the commit point; this covers liveness + isolation under real
multi-process contention.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

import pytest

N_WRITERS = 3
COMMITS_EACH = 3

_WORKER = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
root, wid, n_commits = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.environ["SPARK_DRIVER_MEM"] = "2g"
os.environ["SPARK_GRAFT_CPUS"] = "4"
from pyspark.sql import functions as F

from tcdb_spark.session import get_spark
from tcdb_spark.sources.warehouse import ConcurrentWriteError, Warehouse

spark = get_spark(f"contention-writer-{wid}")
wh = Warehouse(spark, root)
open(os.path.join(root, f"ready_{wid}"), "w").write("1")
while not os.path.exists(os.path.join(root, "go")):
    time.sleep(0.02)

retries, done = 0, 0
deadline = time.time() + 300
while done < n_commits:
    if time.time() > deadline:
        print(f"RESULT wid={wid} commits={done} retries={retries} TIMEOUT")
        sys.exit(3)
    v = wh.current_version("acc")
    cur = wh.read("acc")
    inc = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("delta")
    )
    # read-modify-write: add 1 to every key's value (full-overlap
    # increments = maximum contention; merge() upsert semantics would
    # OVERWRITE, so the increment is expressed as a join-add)
    merged = (
        cur.alias("c")
        .join(inc.alias("i"), "k")
        .select("k", (F.col("c.value") + F.col("i.delta")).alias("value"))
    )
    try:
        wh.write("acc", merged, expect_version=v)
        done += 1
    except ConcurrentWriteError:
        retries += 1
        time.sleep(0.03 + 0.07 * ((retries + int(wid)) % 4))
print(f"RESULT wid={wid} commits={done} retries={retries}")
"""


def test_concurrent_writers_no_lost_updates(spark, tmp_path):
    from pyspark.sql import functions as F

    from tcdb_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.write("acc", spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("value")
    ))
    assert wh.current_version("acc") == 1

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, str(i), str(COMMITS_EACH)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(N_WRITERS)
    ]
    # barrier: release all writers only once every JVM is up
    deadline = time.time() + 180
    while time.time() < deadline:
        if all(os.path.exists(os.path.join(root, f"ready_{i}")) for i in range(N_WRITERS)):
            break
        time.sleep(0.1)
    else:
        for p in procs:
            p.kill()
        pytest.fail("writer JVMs never became ready")
    open(os.path.join(root, "go"), "w").write("1")

    results = {}
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, f"writer {i} failed: {out}"
        m = re.search(r"RESULT wid=(\d+) commits=(\d+) retries=(\d+)", out)
        assert m, f"writer {i} output unparseable: {out}"
        results[int(m.group(1))] = (int(m.group(2)), int(m.group(3)))

    total_commits = sum(c for c, _ in results.values())
    total_retries = sum(r for _, r in results.values())
    assert total_commits == N_WRITERS * COMMITS_EACH

    # no lost updates: every committed increment is in the final state
    final = {r["k"]: r["value"] for r in wh.read("acc").collect()}
    assert final == {k: total_commits for k in range(10)}

    # serializable history: version v carries exactly v-1 increments —
    # each commit was derived from the exact version it CASed against
    assert wh.current_version("acc") == 1 + total_commits
    for v in range(1, 1 + total_commits + 1):
        vals = {r["value"] for r in wh.read("acc", version=v).collect()}
        assert vals == {v - 1}, f"version {v} holds {vals}, expected {{{v-1}}}"

    # the contention path must actually have fired
    assert total_retries > 0, "barrier-started writers never collided"
