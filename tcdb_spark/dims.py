"""Dimension seed data (reference: db/init_db_base.sql:11-42 seeds 6
regions + 5 data sources; the model catalog comes from
db/insert_full_models.sql / settings.yml:28-52 — a representative subset
here; the engine treats models as an open dimension upserted on sight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS = [
    (1, "North Atlantic", "AL", "L"),
    (2, "Eastern Pacific", "EP", "E"),
    (3, "Central Pacific", "CP", "C"),
    (4, "Western Pacific", "WP", "W"),
    (5, "Indian Ocean", "IO", "A"),
    (6, "Southern Hemisphere", "SH", "S"),
]

DATA_SOURCES = [
    (1, "National Hurricane Center", "NHC"),
    (2, "National Centers for Environmental Prediction", "NCEP"),
    (3, "Climate Forecast Applications Network", "CFAN"),
    (4, "Joint Typhoon Warning Center", "JTWC"),
    (5, "Japan Meteorological Agency", "JMA"),
]

# model allowlist (settings.yml:28-52 technique codes)
MODEL_TECHS = [
    "OFCL", "CARQ", "BEST", "AVNO", "AVNI", "EMX", "EMXI", "EGRR", "EGRI",
    "HWRF", "HMON", "CMC", "NVGM", "UKX", "CTCX", "TVCN", "TVCA", "SHIP",
    "DSHP", "LGEM", "TABS", "TABM", "TABD",
]


def regions_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        REGIONS, "region_id long, long_name string, short_name string, region_char string"
    ).withColumn("last_update", F.current_timestamp())


def data_sources_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DATA_SOURCES, "data_source_id long, long_name string, short_name string"
    ).withColumn("last_update", F.current_timestamp())


def models_df(spark: SparkSession) -> DataFrame:
    rows = [(i + 1, t, t) for i, t in enumerate(MODEL_TECHS)]
    return spark.createDataFrame(
        rows, "model_id long, long_name string, short_name string"
    ).withColumn("last_update", F.current_timestamp())
