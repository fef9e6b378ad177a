"""Adversarial warehouse tests (round-2 verdict #5): cross-process
writer contention on the real advisory lock + CAS, vacuum racing a live
reader over hard-linked versions, and bucket-scoped MERGE under a
planted 90%-hot-bucket key skew.

The lock/CAS machinery (sources/warehouse.py _write_lock) was previously
exercised single-session only; these tests drive it from a genuinely
separate Spark process sharing nothing but the filesystem — the exact
multi-writer shape of the reference's cron pipelines (tcdb/pipeline/
run.py) pointed at one store.
"""

from __future__ import annotations

import contextlib
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from tcdb_spark.sources.warehouse import ConcurrentWriteError, Warehouse, bucket_id_expr

_CONTENDER = """
import os, sys, time
sys.path.insert(0, {repo!r})
root, sync = sys.argv[1], sys.argv[2]
from tcdb_spark.session import get_spark
from tcdb_spark.sources.warehouse import Warehouse, ConcurrentWriteError

spark = get_spark("wh-contender", cpus=2, shuffle_partitions=2)
wh = Warehouse(spark, root)
df = spark.createDataFrame([(1, "contender")], "k int, v string")

# phase A: the main process holds the table lock -> must refuse
try:
    wh.write("kv", df)
    print("UNEXPECTED_SUCCESS", flush=True)
    sys.exit(3)
except ConcurrentWriteError:
    with open(os.path.join(sync, "phase_a_done"), "w") as f:
        f.write("1")

# phase B: wait for the release, then commit the next version
deadline = time.time() + 120
while os.path.exists(os.path.join(root, "kv", "_LOCK")):
    if time.time() > deadline:
        sys.exit(4)
    time.sleep(0.2)
v = wh.write("kv", df)
print("FINAL_VERSION", v, flush=True)
sys.exit(0)
"""


def test_concurrent_writer_cross_process(spark, tmp_path):
    """A second Spark PROCESS (own JVM, own session, shared filesystem
    only) must (a) get ConcurrentWriteError while this session holds the
    table lock, (b) commit cleanly once it's released, after which (c)
    this session's CAS write — whose plan was derived from the
    now-stale version — must refuse instead of clobbering."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    assert wh.write("kv", spark.createDataFrame([(1, "main")], "k int, v string")) == 1

    script = tmp_path / "contender.py"
    script.write_text(_CONTENDER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

    held = contextlib.ExitStack()
    held.enter_context(wh._write_lock("kv"))
    try:
        proc = subprocess.Popen(
            [sys.executable, str(script), root, str(tmp_path)],
            cwd=str(tmp_path),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env={**os.environ, "SPARK_DRIVER_MEM": "2g"},
            text=True,
        )
        deadline = time.time() + 300
        while not (tmp_path / "phase_a_done").exists():
            assert proc.poll() is None, proc.communicate()
            assert time.time() < deadline, "contender never hit the lock"
            time.sleep(0.3)
    finally:
        held.close()  # release the lock -> contender's phase B proceeds

    out, err = proc.communicate(timeout=300)
    assert proc.returncode == 0, (out, err)
    assert "FINAL_VERSION 2" in out
    assert wh.current_version("kv") == 2

    # CAS: this session's plan was derived from v1; the contender moved
    # the table to v2 in between — the commit must refuse, not clobber.
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        wh.write(
            "kv",
            spark.createDataFrame([(2, "stale-plan")], "k int, v string"),
            expect_version=1,
        )
    # and a fresh read-then-write succeeds
    assert wh.write(
        "kv",
        spark.createDataFrame([(2, "fresh")], "k int, v string"),
        expect_version=2,
    ) == 3


def test_vacuum_with_live_reader_on_hardlinked_version(spark, tmp_path):
    """merge_scoped carries untouched buckets into v2 as hard links of
    v1's files. Vacuuming v1 drops only its NAMES: a reader already
    planted on v2 must keep seeing every byte, while time travel to the
    vacuumed v1 fails with the documented error."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(0).alias("val"))
    assert wh.write_bucketed("t", base, bucket_cols=["k"], n_buckets=4) == 1

    inc = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1).alias("val"))
    stats = wh.merge_scoped("t", inc, keys=["k"])
    assert stats["version"] == 2
    assert stats["carried_files"] > 0, "expected untouched buckets to carry as links"

    reader = wh.read("t")  # lazy plan over v2 (carried files = v1 hard links)
    assert wh.vacuum("t", keep_last=1) == [1]

    assert reader.count() == 1000
    assert reader.where("val = 1").count() == 10
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        wh.read("t", version=1)


def test_merge_scoped_hot_bucket_skew(spark, tmp_path):
    """90% of the table's keys (and of the incoming batch) hash into ONE
    bucket — the planted-hot-key shape that breaks naive per-bucket
    work-balancing. The scoped MERGE must still: touch only the buckets
    the batch hashes into, carry every other file as a link, and produce
    the exact upsert result."""
    n_buckets = 8
    cand = spark.range(0, 120000).select(F.col("id").alias("k")).withColumn(
        "b", bucket_id_expr(["k"], n_buckets)
    )
    hot = [r["k"] for r in cand.where("b = 0").limit(9000).collect()]
    cold = [r["k"] for r in cand.where("b != 0").limit(1000).collect()]
    assert len(hot) == 9000 and len(cold) == 1000

    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame([(k, 0) for k in hot + cold], "k long, val int")
    wh.write_bucketed("skewed", base, bucket_cols=["k"], n_buckets=n_buckets)

    new_key = 999_999_999
    inc_rows = [(k, 1) for k in hot[:4500]] + [(cold[0], 1), (new_key, 1)]
    inc = spark.createDataFrame(inc_rows, "k long, val int")
    expect_touched = {
        r["b"]
        for r in inc.select(bucket_id_expr(["k"], n_buckets).alias("b")).distinct().collect()
    }

    stats = wh.merge_scoped("skewed", inc, keys=["k"])
    assert set(stats["touched_buckets"]) == expect_touched
    assert len(expect_touched) < n_buckets
    assert stats["carried_files"] > 0, "cold buckets must carry, not rewrite"

    out = wh.read("skewed")
    assert out.count() == 10001  # 10000 base + 1 insert
    assert out.where("val = 1").count() == 4502  # 4500 hot + 1 cold update + 1 insert
    assert out.where("val = 0").count() == 5499  # everything untouched
