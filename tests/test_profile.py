"""profile_table: typed per-column stats, null handling, and the
one-scan contract."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tcdb_spark.operators.profile import profile_table


def _fixture(spark):
    rows = [
        (1, "a", 1.5, datetime.datetime(2024, 1, 1)),
        (2, "b", None, datetime.datetime(2024, 6, 1)),
        (3, None, 2.5, None),
        (3, "a", 2.5, datetime.datetime(2024, 1, 1)),
    ]
    return spark.createDataFrame(rows, "k bigint, s string, v double, ts timestamp")


def test_profile_values(spark):
    out = {r["col_name"]: r for r in profile_table(_fixture(spark)).collect()}
    assert set(out) == {"k", "s", "v", "ts"}
    k = out["k"]
    assert (k["n_rows"], k["n_nonnull"], k["n_distinct"]) == (4, 4, 3)
    assert (k["min_num"], k["max_num"]) == (1.0, 3.0)
    assert k["min_str"] is None
    s = out["s"]
    assert (s["n_nonnull"], s["n_distinct"]) == (3, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    v = out["v"]
    assert (v["n_nonnull"], v["n_distinct"], v["min_num"], v["max_num"]) == (3, 2, 1.5, 2.5)
    ts = out["ts"]
    assert ts["n_nonnull"] == 3
    assert ts["min_str"] == "2024-01-01 00:00:00"
    assert ts["max_str"] == "2024-06-01 00:00:00"


def test_profile_is_one_scan(spark, tmp_path):
    """All columns must profile from a single table read — the oracle's
    scan-per-column shape is exactly what this operator exists to
    avoid at 100 TB."""
    _fixture(spark).write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    df = spark.read.parquet(str(tmp_path / "t.parquet"))
    prof = profile_table(df)
    prof.collect()
    plan = prof._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan


def test_profile_column_subset(spark):
    out = profile_table(_fixture(spark), ["k"]).collect()
    assert [r["col_name"] for r in out] == ["k"]
