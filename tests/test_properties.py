"""Hypothesis property tests (SURVEY.md §5 item 4): round-trips and
idempotence laws on small generated inputs. Data volumes stay tiny —
the properties are about semantics, not scale."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tcdb_spark.functions.scalar import (
    cycle_floor,
    latlon_decode_lat,
    latlon_decode_lon,
)
from tcdb_spark.operators.merge import merge

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    lats=st.lists(
        st.integers(min_value=0, max_value=900), min_size=1, max_size=8
    ),
    north=st.lists(st.booleans(), min_size=8, max_size=8),
)
@_slow
def test_latlon_encode_decode_roundtrip(spark, lats, north):
    """decode(encode(x)) == ±x/10 for every tenths-magnitude int."""
    rows = [
        (f"{v}{'N' if n else 'S'}", f"{v}{'E' if n else 'W'}", v, n)
        for v, n in zip(lats, north)
    ]
    df = spark.createDataFrame(rows, "lat_s string, lon_s string, mag int, north boolean")
    out = df.select(
        "mag", "north",
        latlon_decode_lat("lat_s").alias("lat"),
        latlon_decode_lon("lon_s").alias("lon"),
    ).collect()
    for r in out:
        expect = r["mag"] / 10.0
        assert r["lat"] == (expect if r["north"] else -expect)
        assert r["lon"] == (expect if r["north"] else -expect)


@given(
    seconds=st.lists(
        st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=6
    ),
    hours=st.sampled_from([1, 3, 6, 12, 24]),
)
@_slow
def test_cycle_floor_properties(spark, seconds, hours):
    """floor(ts) <= ts, floor is idempotent, and lands on a cycle hour."""
    base = dt.datetime(2022, 1, 1)
    rows = [(base + dt.timedelta(seconds=s),) for s in seconds]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = df.select(
        "ts",
        cycle_floor("ts", hours).alias("c1"),
        cycle_floor(cycle_floor("ts", hours), hours).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] <= r["ts"]
        assert r["c1"] == r["c2"]
        assert r["c1"].hour % hours == 0
        assert r["c1"].minute == 0 and r["c1"].second == 0


@given(
    current=st.lists(
        st.tuples(st.integers(0, 6), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    incoming=st.lists(
        st.tuples(st.integers(0, 6), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
@_slow
def test_merge_laws(spark, current, incoming):
    """MERGE laws on arbitrary keyed batches: (1) result keys = union of
    input keys; (2) incoming wins on intersection; (3) replay is a fixed
    point."""
    cur = spark.createDataFrame(current or [], "k int, v float")
    inc = spark.createDataFrame(incoming or [], "k int, v float")
    once = merge(cur, inc, keys=["k"])
    got = {r["k"]: r["v"] for r in once.collect()}
    expect = {k: v for k, v in current}
    expect.update({k: v for k, v in incoming})
    assert got == expect
    twice = merge(once, inc, keys=["k"])
    assert {(r["k"], r["v"]) for r in twice.collect()} == set(got.items())
