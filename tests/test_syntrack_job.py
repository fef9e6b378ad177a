"""Syntrack ensemble job end-to-end + idempotence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tcdb_spark.jobs.syntracks import ENS_MEAN_LABEL, run_syntrack_job
from tcdb_spark.sources.mat_ensemble import fake_ensemble_df
from tcdb_spark.sources.warehouse import Warehouse

INIT = dt.datetime(2022, 9, 1, 0, 0, 0)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_syntrack_job_end_to_end(spark, wh):
    ensemble = fake_ensemble_df(spark, n_ens=6, n_steps=4, init=INIT)
    invests = spark.createDataFrame(
        [("ECMWF", INIT, 1, "INVEST-95L", 10.2, -40.2, INIT)],
        "model string, init timestamp, annual_id int, name string, lat double, lon double, valid timestamp",
    )
    counts = run_syntrack_job(spark, ensemble, invests, wh, run_id="S__1")
    # 5 real members + ens-mean pseudo-member
    assert counts == {"tracks": 6, "steps": 6 * 4}

    tracks = wh.read("tracks")
    assert tracks.where(F.col("ensemble_number") == ENS_MEAN_LABEL).count() == 1
    steps = wh.read("steps")
    assert steps.where(F.col("latitude").isNull()).count() == 0

    # replay -> fixed point, audit untouched
    counts2 = run_syntrack_job(spark, ensemble, invests, wh, run_id="S__2")
    assert counts2 == counts
    assert wh.read("steps").where(F.col("run_id") == "S__2").count() == 0
