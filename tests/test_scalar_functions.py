"""Unit tests for the scalar column functions (SURVEY.md §2.2) — edge
cases from the reference semantics (tcdb/etl/atcf.py, tcdb/utils.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tcdb_spark.functions import scalar as S


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("out")).first()["out"]


def test_latlon_decode_hemispheres(spark):
    rows = spark.createDataFrame(
        [("123N", "450W"), ("95S", "1230E"), (" 254N ", " 725W "), ("0N", "0E")],
        ["lat", "lon"],
    ).select(
        S.latlon_decode_lat("lat").alias("la"), S.latlon_decode_lon("lon").alias("lo")
    ).collect()
    assert [(r["la"], r["lo"]) for r in rows] == [
        (12.3, -45.0),
        (-9.5, 123.0),
        (25.4, -72.5),
        (0.0, 0.0),
    ]


def test_latlon_decode_garbage_is_null(spark):
    r = _one(spark, S.latlon_decode_lat(F.col("x")), x="garbage")
    assert r is None


def test_ts_parse(spark):
    r = _one(spark, S.ts_parse(F.col("x")), x="2022092806")
    assert (r.year, r.month, r.day, r.hour) == (2022, 9, 28, 6)


def test_storm_type_boundaries(spark):
    # thresholds from tcdb/utils.py:71-121
    cases = [
        (33.9, "AL", "TD"), (34.0, "AL", "TS"), (62.9, "AL", "TS"), (63.0, "AL", "HU"),
        (129.9, "WP", "TY"), (130.0, "WP", "STY"), (33.9, "WP", "TD"),
        (62.9, "SH", "TC"), (63.0, "SH", "STC"),
        (27.9, "IO", "DE"), (28.0, "IO", "DD"), (47.9, "IO", "CS"), (48.0, "IO", "SCS"),
        (89.9, "IO", "VSCS"), (90.0, "IO", "ESCS"), (120.0, "IO", "SuCS"),
        (50.0, "XX", "CY"),
    ]
    df = spark.createDataFrame([(w, b) for w, b, _ in cases], ["wind", "basin"])
    out = df.select(S.storm_type("wind", "basin").alias("t")).collect()
    assert [r["t"] for r in out] == [e for _, _, e in cases]


def test_nhc_id(spark):
    assert _one(spark, S.nhc_id(F.col("b"), F.col("n"), F.col("s")), b="al", n=5, s=2022) == "AL052022"
    assert _one(spark, S.nhc_id(F.col("b"), F.col("n"), F.col("s")), b="EP", n=91, s=2023) == "EP912023"


def test_haversine_known_distance(spark):
    # 1 degree of latitude = 60 nm by definition of the formula
    d = _one(
        spark,
        S.haversine(F.col("a"), F.col("b"), F.col("c"), F.col("d"), "nm"),
        a=10.0, b=20.0, c=11.0, d=20.0,
    )
    assert math.isclose(d, 60.0, rel_tol=1e-9)
    # same point -> 0
    z = _one(
        spark,
        S.haversine(F.col("a"), F.col("b"), F.col("c"), F.col("d"), "km"),
        a=10.0, b=20.0, c=10.0, d=20.0,
    )
    assert z == 0.0


def test_cycle_floor(spark):
    import datetime as dt

    r = _one(spark, S.cycle_floor(F.col("x"), 6), x=dt.datetime(2022, 9, 28, 17, 59, 59))
    assert r == dt.datetime(2022, 9, 28, 12, 0, 0)
    r = _one(spark, S.cycle_floor(F.col("x"), 6), x=dt.datetime(2022, 9, 28, 18, 0, 0))
    assert r == dt.datetime(2022, 9, 28, 18, 0, 0)


def test_valid_time(spark):
    import datetime as dt

    r = _one(
        spark,
        S.valid_time(F.col("i"), F.col("h")),
        i=dt.datetime(2022, 9, 28, 0, 0, 0), h=126,
    )
    assert r == dt.datetime(2022, 10, 3, 6, 0, 0)


def test_storm_status(spark):
    import datetime as dt

    now = F.lit("2022-09-28 16:00:00").cast("timestamp")
    r = _one(spark, S.storm_status(F.col("e"), now, 16), e=dt.datetime(2022, 9, 28, 0, 0, 0))
    assert r == "Active"
    r = _one(spark, S.storm_status(F.col("e"), now, 16), e=dt.datetime(2022, 9, 27, 23, 59, 0))
    assert r == "Archive"


def test_invest_name(spark):
    df = spark.createDataFrame(
        [("NHC", 91, "E", "DB", "invest"), ("JTWC", 3, "S", "STC", "DARIAN")],
        ["org", "num", "sub", "stype", "raw"],
    )
    out = df.select(
        S.invest_name("org", "num", "sub", "stype", "raw").alias("n")
    ).collect()
    assert [r["n"] for r in out] == ["NHC-91E", "STC-Darian"]
