"""Open-format export bridge (VERDICT r6 #6): an exported snapshot must
be a self-contained plain-parquet directory any engine reads with no
warehouse knowledge, equal to the time-travel read it came from, with
an auditable manifest — and it must survive the source version being
vacuumed afterwards."""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F


def _mk_table(spark, wh):
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )
    wh.write("t", df)
    # second version: mutate so v1 != v2
    wh.write("t", df.where(F.col("k") < 100).withColumn("val", F.col("val") + 1000))
    return df


@pytest.fixture()
def wh(spark, tmp_path):
    from tcdb_spark.sources.warehouse import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))


def _canon(df):
    return sorted((r["k"], r["grp"], round(r["val"], 6)) for r in df.collect())


def test_export_equals_time_travel_both_versions(spark, wh, tmp_path):
    _mk_table(spark, wh)
    for v in (1, 2):
        dest = str(tmp_path / f"export_v{v}")
        manifest = wh.export_snapshot("t", dest, version=v)
        plain = spark.read.parquet(dest)
        assert _canon(plain) == _canon(wh.read("t", version=v))
        assert manifest["row_count"] == plain.count()
        assert manifest["source_version"] == v
        # manifest on disk matches the returned one
        disk = json.load(open(os.path.join(dest, "_EXPORT_MANIFEST.json")))
        assert disk["files"] == manifest["files"] and len(disk["files"]) > 0
        # symlink manifest lists real absolute parquet files
        lines = open(
            os.path.join(dest, "_symlink_format_manifest", "manifest")
        ).read().splitlines()
        assert lines and all(os.path.isfile(p) and p.endswith(".parquet") for p in lines)


def test_export_readable_by_duckdb(spark, wh, tmp_path):
    """The point of the bridge: a FOREIGN engine reads the export."""
    _mk_table(spark, wh)
    dest = str(tmp_path / "export_duck")
    wh.export_snapshot("t", dest)
    n = duckdb.sql(f"SELECT count(*) AS n FROM read_parquet('{dest}/*.parquet')").fetchone()[0]
    assert n == wh.read("t").count()


def test_export_survives_vacuum_of_source(spark, wh, tmp_path):
    _mk_table(spark, wh)
    dest = str(tmp_path / "export_keep")
    wh.export_snapshot("t", dest, version=1)
    before = _canon(spark.read.parquet(dest))
    wh.vacuum("t", keep_last=1)  # drops v=1 from the warehouse
    with pytest.raises(FileNotFoundError):
        wh.read("t", version=1)
    assert _canon(spark.read.parquet(dest)) == before  # hard links keep bytes alive


def test_export_partitioned_and_refuses_overwrite(spark, wh, tmp_path):
    _mk_table(spark, wh)
    dest = str(tmp_path / "export_part")
    manifest = wh.export_snapshot("t", dest, partition_by=["grp"])
    assert manifest["partition_by"] == ["grp"]
    plain = spark.read.parquet(dest)
    assert _canon(plain) == _canon(wh.read("t"))
    with pytest.raises(FileExistsError):
        wh.export_snapshot("t", dest)


def test_import_round_trip(spark, wh, tmp_path):
    _mk_table(spark, wh)
    dest = str(tmp_path / "export_rt")
    wh.export_snapshot("t", dest, version=2)
    v = wh.import_snapshot(dest, "t_back")
    assert v == 1
    assert _canon(wh.read("t_back")) == _canon(wh.read("t", version=2))


def test_delta_export_capability_gated(spark, wh, tmp_path):
    _mk_table(spark, wh)
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark present — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="delta-spark"):
        wh.export_snapshot_delta("t", str(tmp_path / "export_delta"))
