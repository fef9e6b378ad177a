"""tcvitals reader: whitespace-separated 30-column fixed format with
sentinel missing values (reference: scripts/download_parse_tcvitals.py:5-30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.functions.scalar import latlon_decode_lat, latlon_decode_lon
from tcdb_spark.schemas import TCVITALS_COLUMNS, TCVITALS_SENTINELS

_STR_COLS = {"org", "system_id", "storm_name", "storm_depth", "storm_type", "latitude", "longitude"}


def parse_tcvitals_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Split on runs of whitespace, map sentinels (-9/-99/-999/-999W/...)
    to NULL, decode hemisphere lat/lon, assemble the datetime from the
    date+time fields."""
    fields = F.split(F.trim(F.col(value_col)), r"\s+")
    df = lines.withColumn("__f", fields).where(F.size("__f") >= len(TCVITALS_COLUMNS))
    cols = []
    for i, name in enumerate(TCVITALS_COLUMNS):
        raw = F.element_at(F.col("__f"), i + 1)
        raw = F.when(raw.isin(TCVITALS_SENTINELS), None).otherwise(raw)
        if name in _STR_COLS:
            cols.append(raw.alias(name))
        else:
            cols.append(raw.try_cast("double").alias(name))
    out = df.select(*cols)
    return (
        out.withColumn(
            "datetime_utc",
            F.to_timestamp(
                F.concat(
                    F.col("date").cast("long").cast("string"),
                    F.lpad(F.col("time").cast("long").cast("string"), 4, "0"),
                ),
                "yyyyMMddHHmm",
            ),
        )
        .withColumn("lat", latlon_decode_lat("latitude"))
        .withColumn("lon", latlon_decode_lon("longitude"))
    )
