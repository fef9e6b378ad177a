"""session.scratch_dir resolution: conf-rooted shared path, local-mode
tempdir fallback, hard error on a real cluster with no configured root
(ADVICE r5: catalog entry points defaulted iterative round state to a
driver-local tempdir, which is not shared with cluster executors)."""

import pytest

from tcdb_spark.session import scratch_dir


class _FakeConf:
    def __init__(self, values):
        self._v = values

    def get(self, key, default=None):
        return self._v.get(key, default)


class _FakeSpark:
    def __init__(self, values):
        self.conf = _FakeConf(values)


def test_conf_root_wins_and_is_unique():
    s = _FakeSpark({"tcdb.scratch.dir": "/shared/scratch/"})
    a = scratch_dir(s, "bt_")
    b = scratch_dir(s, "bt_")
    assert a.startswith("/shared/scratch/bt_")
    assert a != b  # concurrent jobs never collide


def test_local_mode_falls_back_to_tempdir(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        s = _FakeSpark({"spark.master": "local[4]"})
        d = scratch_dir(s, "cc_")
        assert d.startswith(str(tmp_path))
    finally:
        tempfile.tempdir = None


def test_cluster_without_conf_raises():
    s = _FakeSpark({"spark.master": "spark://host:7077"})
    with pytest.raises(ValueError, match="tcdb.scratch.dir"):
        scratch_dir(s, "bt_")


def test_real_session_resolves(spark):
    # the real SparkSession path: local-mode fallback works end to end
    d = scratch_dir(spark, "probe_")
    assert "probe_" in d


def test_remove_scratch_deletes_and_never_raises(spark, tmp_path):
    from tcdb_spark.session import remove_scratch

    d = tmp_path / "dead_rounds"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    assert remove_scratch(spark, str(d)) is True
    assert not d.exists()
    # advisory by contract: a missing path is False, not an exception
    assert remove_scratch(spark, str(tmp_path / "never_existed")) is False


def test_bt_distributed_cleans_intermediate_rounds(spark, tmp_path):
    """ADVICE r6: iterative round state must not accumulate — after the
    run only the final round dir (backing the returned DataFrame)
    remains under the work dir."""
    import os

    from tcdb_spark.plans.queries_stats import bt_ratings_distributed

    wins = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 2), ("a", "c", 4), ("c", "a", 1)],
        "winner string, loser string, n_wins int",
    )
    work = str(tmp_path / "bt_rounds")
    out = bt_ratings_distributed(wins, "item", work_dir=work, iters=4)
    rows = out.collect()
    assert len(rows) == 3
    leftover = sorted(os.listdir(work))
    assert leftover == ["final"], leftover
