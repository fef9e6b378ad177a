"""load_tables timestamp normalization: the driver's generator has
shipped two physical parquet types for ``events.ts`` across rounds —
TIMESTAMP(NANOS) (readable only as long via nanosAsLong) and tz-naive
timestamp[us] (inferred as TIMESTAMP_NTZ by Spark 4). Both must land as
plain TimestampType with identical wall-clock values, or every epoch
cast and DuckDB oracle compare downstream silently breaks.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tcdb_spark.plans.catalog import load_tables

TS = [
    datetime.datetime(2024, 1, 1, 6, 30, 0),
    datetime.datetime(2024, 1, 2, 18, 0, 0, 123456),
]


def _write(tmp_path, name, arrow_type):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(TS, arrow_type),
        }
    )
    pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("us"), pa.timestamp("ns")],
    ids=["ntz-micros", "nanos"],
)
def test_ts_lands_as_timestamp_type(spark, tmp_path, arrow_type):
    _write(tmp_path, "events", arrow_type)
    df = load_tables(spark, str(tmp_path), "events")["events"]
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS

    # Epoch arithmetic — the operation TIMESTAMP_NTZ refuses — works.
    from pyspark.sql import functions as F

    secs = df.select(F.col("ts").cast("bigint").alias("s")).collect()
    assert all(r["s"] > 0 for r in secs)


def test_ntz_columns_normalized_under_any_name(spark, tmp_path):
    """The NTZ branch applies to every timestamp_ntz column, not just ts."""
    tbl = pa.table(
        {
            "created_at": pa.array(TS, pa.timestamp("us")),
            "k": pa.array([1, 2], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "dim.parquet"))
    df = load_tables(spark, str(tmp_path), "dim")["dim"]
    assert dict(df.dtypes)["created_at"] == "timestamp"
