"""Explicit StructType schemas for every source and table.

The reference declares schemas three times (SQL DDL ``db/init_db_base.sql``,
SQLAlchemy models ``tcdb/models/*.py``, positional CSV headers
``tcdb/etl/atcf.py:31-49,101-139``). Here each lives once, as a StructType.
Production read paths never use ``inferSchema``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw ATCF deck formats (headerless CSV, fixed positional columns).
# Column names follow the public ATCF spec
# (https://www.nrlmry.navy.mil/atcf_web/docs/database/new/abdeck.txt), the
# same names the reference uses (tcdb/etl/atcf.py:31-49, 101-139).
# Everything lands as string; typing happens in sources/atcf.py projections.
# ---------------------------------------------------------------------------

ADECK_COLUMNS = [
    "BASIN", "SNUM", "DATETIME", "TECHNUM/MIN", "TECH", "TAU",
    "LAT", "LON", "VMAX", "MSLP", "TY", "RAD", "WINDCODE",
    "NE", "SE", "SW", "NW",
]

BDECK_COLUMNS = ADECK_COLUMNS + [
    "POUTER", "ROCI", "RMW", "GUSTS", "EYE", "SUBREGION", "MAXSEAS",
    "INITIALS", "DIR", "SPEED", "STORMNAME", "DEPTH", "SEAS", "SEASCODE",
    "SEAS1", "SEAS2", "SEAS3", "SEAS4", "USERDEFINED", "userdata",
]

# tcvitals fixed 30-column whitespace-separated format
# (scripts/download_parse_tcvitals.py:5-24 in the reference).
TCVITALS_COLUMNS = [
    "org", "system_id", "storm_name", "date", "time",
    "latitude", "longitude", "storm_direction_degrees", "storm_speed_dms",
    "mslp_mb", "env_press_mb", "roci_km", "vmax_ms", "rmw_km",
    "r34_ne_km", "r34_se_km", "r34_sw_km", "r34_nw_km", "storm_depth",
    "r50_ne_km", "r50_se_km", "r50_sw_km", "r50_nw_km",
    "max_forecast_hour", "max_forecast_lat", "max_forecast_lon",
    "r64_ne_km", "r64_se_km", "r64_sw_km", "r64_nw_km",
]

TCVITALS_SENTINELS = ["-9", "-99", "-999", "-999W", "-999N", "-99N"]


def _string_schema(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


ADECK_RAW_SCHEMA = _string_schema(ADECK_COLUMNS)
BDECK_RAW_SCHEMA = _string_schema(BDECK_COLUMNS)
TCVITALS_RAW_SCHEMA = _string_schema(TCVITALS_COLUMNS)

# ---------------------------------------------------------------------------
# Normalized star schema (reference DDL db/init_db_base.sql:3-122).
# Surrogate autoincrement ids are replaced by natural keys + xxhash64
# identity keys so MERGE levels parallelize (SURVEY.md §2.8).
# ---------------------------------------------------------------------------

REGIONS_SCHEMA = T.StructType([
    T.StructField("region_id", T.LongType(), False),
    T.StructField("long_name", T.StringType(), True),
    T.StructField("short_name", T.StringType(), False),   # natural key
    T.StructField("region_char", T.StringType(), True),
    T.StructField("last_update", T.TimestampType(), True),
])

MODELS_SCHEMA = T.StructType([
    T.StructField("model_id", T.LongType(), False),
    T.StructField("long_name", T.StringType(), True),
    T.StructField("short_name", T.StringType(), False),   # natural key
    T.StructField("last_update", T.TimestampType(), True),
])

DATA_SOURCES_SCHEMA = T.StructType([
    T.StructField("data_source_id", T.LongType(), False),
    T.StructField("long_name", T.StringType(), True),
    T.StructField("short_name", T.StringType(), False),   # natural key
    T.StructField("last_update", T.TimestampType(), True),
])

STORMS_SCHEMA = T.StructType([
    T.StructField("storm_id", T.LongType(), False),       # xxhash64(start_date, nhc_id)
    T.StructField("annual_id", T.IntegerType(), True),
    T.StructField("region_id", T.LongType(), True),
    T.StructField("nhc_number", T.IntegerType(), True),
    T.StructField("nhc_id", T.StringType(), False),
    T.StructField("season", T.IntegerType(), True),
    T.StructField("start_date", T.TimestampType(), False),
    T.StructField("end_date", T.TimestampType(), True),
    T.StructField("status", T.StringType(), True),         # Active | Archive
    T.StructField("name", T.StringType(), True),
    T.StructField("start_lat", T.DoubleType(), True),
    T.StructField("start_lon", T.DoubleType(), True),
    T.StructField("run_id", T.StringType(), True),
    T.StructField("last_update", T.TimestampType(), True),
])

_RADII = [f"r{r}_{q}" for r in (34, 50, 64) for q in ("ne", "se", "sw", "nw")]

OBSERVATIONS_SCHEMA = T.StructType(
    [
        T.StructField("storm_id", T.LongType(), False),
        T.StructField("datetime_utc", T.TimestampType(), False),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("intensity_kts", T.DoubleType(), True),
        T.StructField("mslp_mb", T.DoubleType(), True),
    ]
    + [T.StructField(c, T.IntegerType(), True) for c in _RADII]
    + [
        T.StructField("pouter_mb", T.IntegerType(), True),
        T.StructField("router_nmi", T.IntegerType(), True),
        T.StructField("rmw_nmi", T.IntegerType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("last_update", T.TimestampType(), True),
    ]
)

FORECASTS_SCHEMA = T.StructType([
    T.StructField("forecast_id", T.LongType(), False),
    T.StructField("data_source_id", T.LongType(), False),
    T.StructField("model_id", T.LongType(), False),
    T.StructField("region_id", T.LongType(), False),
    T.StructField("datetime_utc", T.TimestampType(), False),
    T.StructField("run_id", T.StringType(), True),
    T.StructField("last_update", T.TimestampType(), True),
])

TRACKS_SCHEMA = T.StructType([
    T.StructField("track_id", T.LongType(), False),
    T.StructField("storm_id", T.LongType(), False),
    T.StructField("forecast_id", T.LongType(), False),
    T.StructField("ensemble_number", T.IntegerType(), False),
    T.StructField("run_id", T.StringType(), True),
    T.StructField("last_update", T.TimestampType(), True),
])

STEPS_SCHEMA = T.StructType([
    T.StructField("step_id", T.LongType(), False),
    T.StructField("track_id", T.LongType(), False),
    T.StructField("hour", T.IntegerType(), False),
    T.StructField("latitude", T.DoubleType(), True),
    T.StructField("longitude", T.DoubleType(), True),
    T.StructField("intensity_kts", T.DoubleType(), True),
    T.StructField("mslp_mb", T.DoubleType(), True),
    T.StructField("run_id", T.StringType(), True),
    T.StructField("last_update", T.TimestampType(), True),
])

# Natural keys (reference unique indexes db/init_db_base.sql:137-145):
# these are the MERGE join keys of every upsert operator.
NATURAL_KEYS = {
    "regions": ["short_name"],
    "models": ["short_name"],
    "data_sources": ["short_name"],
    "storms": ["start_date", "nhc_id"],
    "observations": ["storm_id", "datetime_utc"],
    "forecasts": ["region_id", "data_source_id", "model_id", "datetime_utc"],
    "tracks": ["forecast_id", "storm_id", "ensemble_number"],
    "steps": ["track_id", "hour"],
}

# Long-format ensemble track table (replaces the reference's xarray
# (ensemble, step) matrices — tcdb/etl/syntracks.py:18-33,91-149).
SYNTRACK_SCHEMA = T.StructType([
    T.StructField("model", T.StringType(), False),
    T.StructField("init", T.TimestampType(), False),
    T.StructField("ensemble", T.IntegerType(), False),   # -1=DET, 0=CTRL, >=1 ENS
    T.StructField("annual_id", T.IntegerType(), True),   # 0 = unassigned
    T.StructField("storm_name", T.StringType(), True),
    T.StructField("hour", T.IntegerType(), False),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("wind", T.DoubleType(), True),
    T.StructField("mslp", T.DoubleType(), True),
])

# Driver testdata tables (TESTDATA.md) used by the oracle-checked catalog.
TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Multimodal: opaque payload + typed metadata (SURVEY.md §2.12).
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), False),  # image|audio|video
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("meta_json", T.StringType(), True),
])
