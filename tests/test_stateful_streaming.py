"""applyInPandasWithState lifecycle operator test: drive a streaming
query over staged parquet micro-batches and observe transition events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tcdb_spark.streaming.stateful import storm_lifecycle_stream

SCHEMA = (
    "nhc_id string, nhc_number int, datetime_utc timestamp, intensity_kts double"
)


def test_storm_lifecycle_stream(spark, tmp_path):
    t0 = dt.datetime(2022, 9, 24, 0, 0)

    batch = [
        # invest appears, later upgraded to named (same nhc_id track key
        # after entity resolution), and intensifies
        ("AL092022", 95, t0, 25.0),
        ("AL092022", 95, t0 + dt.timedelta(hours=6), 30.0),
        ("AL092022", 9, t0 + dt.timedelta(hours=12), 40.0),
        ("AL092022", 9, t0 + dt.timedelta(hours=18), 55.0),
        # a named storm with steady winds: genesis only
        ("EP052022", 5, t0, 50.0),
        ("EP052022", 5, t0 + dt.timedelta(hours=6), 55.0),
    ]
    src = tmp_path / "obs_stream"
    spark.createDataFrame(batch, SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    out = storm_lifecycle_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lifecycle")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM lifecycle ORDER BY nhc_id, at").collect()
    by_storm = {}
    for r in rows:
        by_storm.setdefault(r["nhc_id"], []).append(r["event"])
    assert by_storm["AL092022"][0] == "genesis"
    assert "invest_upgraded" in by_storm["AL092022"]
    assert "intensified" in by_storm["AL092022"]  # 25 -> 40+ jump
    assert by_storm["EP052022"] == ["genesis"]
