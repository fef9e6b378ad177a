"""Multimodal + tcvitals catalog entries — golden-checked like the ATCF
scans: literal inputs through the real engine path, VALUES oracles with
hand/python-computed expected rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.plans.catalog import register
from tcdb_spark.plans.queries_atcf import _values_oracle
from tcdb_spark.sources.multimodal import (
    FEATURE_DIM,
    _fake_features,
    extract_features,
    make_test_ppm,
    make_test_wav,
    media_features,
)
from tcdb_spark.sources.tcvitals import parse_tcvitals_lines

# REAL formats (PPM pixels, WAV samples — decoded from actual bytes) plus
# opaque payloads that exercise the stub fallback.
_PAYLOADS = [
    (1, b"payload-one", "image"),
    (2, b"payload-two", "video"),
    (3, b"\x00\x01\x02binary\xff", "audio"),
    (4, make_test_ppm(), "image/ppm"),
    (5, make_test_wav(), "audio/wav"),
]

# features are quantized to floor(v * 2^40) integers for the compare:
# DuckDB's string->double parse is not correctly rounded for some repr()
# literals (1 ULP off), so float literals can't ride in the oracle.
_Q = float(2**40)


def _expected_features(payload: bytes) -> list[float]:
    return media_features(payload) or _fake_features(payload, FEATURE_DIM)


import math as _math

_MM_EXPECTED = [
    (mid, mtype, len(payload), idx, int(_math.floor(v * _Q)))  # floor, not
    # truncate: must match F.floor for any negative feature value
    for mid, payload, mtype in _PAYLOADS
    for idx, v in enumerate(_expected_features(payload))
]

_MM_TYPES = [
    ("media_id", "BIGINT"), ("media_type", "VARCHAR"), ("n_bytes", "INTEGER"),
    ("feature_idx", "INTEGER"), ("feature_q", "BIGINT"),
]


@register("multimodal_features", oracle=_values_oracle(_MM_EXPECTED, _MM_TYPES))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> feature vector via Arrow-batched mapInPandas
    (§2.12 multimodal plumbing; decode stubbed deterministically). Output
    exploded to scalar rows so the value-hash stays array-free."""
    media = spark.createDataFrame(
        [(mid, bytearray(p), t) for mid, p, t in _PAYLOADS],
        "media_id long, payload binary, media_type string",
    )
    feats = extract_features(media, decode_stub=True)
    exploded = feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.posexplode("features").alias("feature_idx", "feature_value"),
    )
    return exploded.select(
        "media_id",
        "media_type",
        "n_bytes",
        "feature_idx",
        F.floor(F.col("feature_value") * F.lit(_Q)).cast("bigint").alias("feature_q"),
    )


_TCVITALS_LINES = [
    "NHC 09L IAN 20220926 0600 251N 0740W 270 08 0996 1010 150 35 030 "
    "060 040 030 050 D -99 -99 -99 -99 72 265N 0755W -999 -999 -999 -999",
    "JTWC 03S DARIAN 20220115 1200 95S 1230E 200 10 0975 1004 120 36 020 "
    "025 025 020 020 D 015 015 010 010 48 -99N -999W -999 -999 -999 -999",
]

_TCV_EXPECTED = [
    ("NHC", "IAN", "2022-09-26 06:00:00", 25.1, -74.0, 996.0, None, 72.0),
    ("JTWC", "DARIAN", "2022-01-15 12:00:00", -9.5, 123.0, 975.0, 15.0, 48.0),
]

_TCV_TYPES = [
    ("org", "VARCHAR"), ("storm_name", "VARCHAR"), ("datetime_utc", "TIMESTAMP"),
    ("lat", "DOUBLE"), ("lon", "DOUBLE"), ("mslp_mb", "DOUBLE"),
    ("r50_ne_km", "DOUBLE"), ("max_forecast_hour", "DOUBLE"),
]


@register("scan_tcvitals", oracle=_values_oracle(_TCV_EXPECTED, _TCV_TYPES))
def scan_tcvitals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tcvitals whitespace-format scan with sentinel->null handling
    (scripts/download_parse_tcvitals.py:5-30). Golden-checked."""
    lines = spark.createDataFrame([(l,) for l in _TCVITALS_LINES], "value string")
    return parse_tcvitals_lines(lines).select(
        "org", "storm_name", "datetime_utc", "lat", "lon", "mslp_mb",
        "r50_ne_km", "max_forecast_hour",
    )
