"""Real .mat ingestion: the pure-stdlib MAT 5 reader/writer round-trip
and the distributed binaryFile+mapInPandas path, checked against the
in-memory fake (same structs, two different byte paths)."""

import datetime as dt

import pytest

from tcdb_spark.sources import mat5
from tcdb_spark.sources.mat_ensemble import (
    fake_ensemble_df,
    read_mat_ensemble,
    read_mat_ensemble_distributed,
    write_fake_mat,
)

INIT = dt.datetime(2022, 9, 1, 0, 0, 0)


def test_mat5_roundtrip_value_types(tmp_path):
    path = str(tmp_path / "vals.mat")
    mat5.save_mat(
        path,
        {
            "scalar": 3.5,
            "vec": [1.0, 2.0, float("nan")],
            "name": "IDALIA",
            "empty": None,
            "nested": {"a": 1.0, "b": "x"},
        },
    )
    raw = mat5.load_mat(path)
    assert raw["scalar"] == 3.5
    vec = list(raw["vec"])
    assert vec[:2] == [1.0, 2.0] and vec[2] != vec[2]
    assert raw["name"] == "IDALIA"
    assert raw["empty"] is None
    assert raw["nested"]["a"] == 1.0 and raw["nested"]["b"] == "x"


@pytest.mark.parametrize("compress", [False, True])
def test_mat_file_matches_in_memory_fake(spark, tmp_path, compress):
    """A written-then-parsed MAT 5 file must produce the exact rows the
    in-memory fake produces — the golden behind scan_mat_ensemble."""
    path = str(tmp_path / "ECMWF_2022090100.mat")
    write_fake_mat(path, n_ens=3, n_steps=2, init=INIT, compress=compress)
    from_mat = read_mat_ensemble(spark, path)  # model/init from filename
    expected = fake_ensemble_df(spark, n_ens=3, n_steps=2, init=INIT)
    assert sorted(map(tuple, from_mat.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_distributed_mat_ingestion(spark, tmp_path):
    """Two files in a landing dir -> one DataFrame, parsed inside Spark
    tasks (mapInPandas), with (model, init) carried by the filenames."""
    write_fake_mat(str(tmp_path / "ECMWF_2022090100.mat"), n_ens=3, n_steps=2, init=INIT)
    write_fake_mat(
        str(tmp_path / "GEFS_2022090112.mat"),
        model="GEFS",
        n_ens=2,
        n_steps=2,
        init=dt.datetime(2022, 9, 1, 12),
        compress=True,
    )
    df = read_mat_ensemble_distributed(spark, str(tmp_path) + "/*.mat")
    by_model = {r["model"]: r for r in df.groupBy("model").count().collect()}
    assert by_model["ECMWF"]["count"] == 6  # 3 members x 2 steps
    assert by_model["GEFS"]["count"] == 4
    inits = {r["init"] for r in df.select("init").distinct().collect()}
    assert inits == {INIT, dt.datetime(2022, 9, 1, 12)}


def test_filename_contract_error(spark, tmp_path):
    path = str(tmp_path / "nonsense.mat")
    write_fake_mat(path, n_ens=2, n_steps=1, init=INIT)
    with pytest.raises(ValueError, match="cannot infer"):
        read_mat_ensemble(spark, path)
    # explicit args override the filename convention
    df = read_mat_ensemble(spark, path, model="ICON", init=INIT)
    assert df.where(df.model == "ICON").count() == 2
