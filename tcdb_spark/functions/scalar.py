"""Scalar column functions — every "UDF" of the reference as a pure,
codegen-friendly Column expression (zero Python UDFs; SURVEY.md §2.2/§2.11).

Each function documents the reference behavior it reproduces
(file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _hemi_magnitude(c: Column) -> Column:
    t = F.trim(c)
    return F.substring(t, F.lit(1), F.length(t) - 1).try_cast("double") / 10


def latlon_decode_lat(c: Column | str) -> Column:
    """ATCF latitude string -> signed degrees: ``"123N"`` -> 12.3,
    ``"95S"`` -> -9.5 (tenths of a degree + hemisphere letter).

    Reference: tcdb/etl/atcf.py:74 (pandas ``.apply`` lambda).
    """
    c = _as_col(c)
    mag = _hemi_magnitude(c)
    return F.when(F.upper(F.trim(c)).endswith("N"), mag).otherwise(-mag)


def latlon_decode_lon(c: Column | str) -> Column:
    """ATCF longitude string -> signed degrees: ``"450W"`` -> -45.0,
    ``"1230E"`` -> 123.0. Reference: tcdb/etl/atcf.py:75.
    """
    c = _as_col(c)
    mag = _hemi_magnitude(c)
    return F.when(F.upper(F.trim(c)).endswith("W"), -mag).otherwise(mag)


def ts_parse(c: Column | str, fmt: str = "yyyyMMddHH") -> Column:
    """Parse ``%Y%m%d%H`` ints/strings to timestamp.

    Reference: tcdb/etl/atcf.py:71,151 (``pd.to_datetime(format="%Y%m%d%H")``).
    """
    return F.to_timestamp(_as_col(c).cast("string"), fmt)


def trim_to_null(c: Column | str) -> Column:
    """Strip whitespace; empty string -> NULL.

    Reference: tcdb/etl/atcf.py:76-86,156-166 (strip + empty->nan).
    """
    c = _as_col(c)
    return F.nullif(F.trim(c), F.lit(""))


def nhc_id(basin: Column | str, nhc_number: Column | str, season: Column | str) -> Column:
    """``nhc_id = upper(basin) + %02d(number) + season`` e.g. AL052022.

    Reference: tcdb/etl/atcf.py:323, tcdb/pipeline/process_obs.py:68.
    """
    return F.upper(
        F.format_string("%s%02d%d", _as_col(basin), _as_col(nhc_number).cast("int"), _as_col(season).cast("int"))
    )


def storm_type(wind: Column | str, region: Column | str) -> Column:
    """Storm category from max sustained wind + basin.

    Reference: tcdb/utils.py:71-121 (``get_storm_type``); thresholds:
    AL/EP: <34 TD, <63 TS, else HU; WP: adds <130 TY else STY;
    SH: <63 TC else STC; IO: <28 DE, <34 DD, <48 CS, <64 SCS, <90 VSCS,
    <120 ESCS, else SuCS; other basins: CY.
    """
    w, r = _as_col(wind), _as_col(region)
    return (
        F.when(r.isin("AL", "EP"),
               F.when(w < 34, "TD").when(w < 63, "TS").otherwise("HU"))
        .when(r == "WP",
              F.when(w < 34, "TD").when(w < 63, "TS").when(w < 130, "TY").otherwise("STY"))
        .when(r == "SH", F.when(w < 63, "TC").otherwise("STC"))
        .when(r == "IO",
              F.when(w < 28, "DE").when(w < 34, "DD").when(w < 48, "CS")
               .when(w < 64, "SCS").when(w < 90, "VSCS").when(w < 120, "ESCS")
               .otherwise("SuCS"))
        .otherwise(F.lit("CY"))
    )


def invest_name(
    org: Column | str,
    nhc_number: Column | str,
    subregion: Column | str,
    storm_type_c: Column | str,
    raw_name: Column | str,
) -> Column:
    """Display-name synthesis: invests (number >= 70) get ``ORG-NNsub``;
    named storms get ``TYPE-Name`` (title-cased).

    Reference: tcdb/etl/atcf.py:294-316 (toStormDict naming).
    """
    num = _as_col(nhc_number).cast("int")
    return F.when(
        num >= 70,
        F.format_string("%s-%02d%s", F.upper(_as_col(org)), num, F.coalesce(_as_col(subregion), F.lit(""))),
    ).otherwise(F.concat(_as_col(storm_type_c), F.lit("-"), F.initcap(_as_col(raw_name))))


def haversine(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str, units: str = "nm"
) -> Column:
    """Great-circle distance between two lat/lon points, as a pure column
    expression (no UDF). Units: nm (default) / km / mi / degrees / rad.

    Reference: tcdb/utils.py:49-69 (``greatCircleDistance``, numpy).
    """
    la1, lo1 = F.radians(_as_col(lat1)), F.radians(_as_col(lon1))
    la2, lo2 = F.radians(_as_col(lat2)), F.radians(_as_col(lon2))
    central = 2.0 * F.asin(
        F.sqrt(
            F.pow(F.sin((la1 - la2) / 2), 2)
            + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo1 - lo2) / 2), 2)
        )
    )
    deg = central * (180.0 / 3.141592653589793)
    if units == "nm":
        return deg * 60.0
    if units == "km":
        return deg * 60.0 * 1.852
    if units == "mi":
        return deg * 60.0 * 1.15077945
    if units == "degrees":
        return deg
    return central


def valid_time(init: Column | str, hour: Column | str) -> Column:
    """``valid = init + hour`` (timestamp + integer forecast hours).

    Reference: tcdb/models/steps.py:64-66, tcdb/etl/syntracks.py:246-249.
    """
    return F.timestamp_add("HOUR", _as_col(hour).cast("int"), _as_col(init))


def cycle_floor(ts: Column | str, hours: int = 6) -> Column:
    """Floor a timestamp to the previous synoptic cycle ({0,6,12,18} for 6h).

    Reference: tcdb/pipeline/adeck.py:243-246, tcdb/pipeline/bdeck.py:199-203.
    """
    c = _as_col(ts)
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / (hours * 3600)) * (hours * 3600))


def storm_uid(basin: Column | str, start_ts: Column | str, start_lat: Column | str) -> Column:
    """Natural uid ``{basin}{yyyyMMddHH}.{int(lat):02d}``.

    Reference: tcdb/pipeline/process_obs.py:17-27 (``getUniqueID``).
    """
    return F.format_string(
        "%s%s.%02d",
        _as_col(basin),
        F.date_format(_as_col(start_ts), "yyyyMMddHH"),
        _as_col(start_lat).cast("int"),
    )


def storm_status(end_date: Column | str, now: Column, hours: int = 16) -> Column:
    """'Active' while ``now - end_date <= hours`` else 'Archive'.

    Reference: tcdb/etl/process_storms.py:205-208 (16 h at ingest);
    tcdb/pipeline/routines.py:14-26 (24 h archive sweep).
    """
    return F.when(
        (now.cast("long") - _as_col(end_date).cast("long")) <= hours * 3600, F.lit("Active")
    ).otherwise(F.lit("Archive"))


def round3(c: Column | str, scale: int = 3) -> Column:
    """Round to 3 decimals (reference rounds track fields to 3, mslp to 2 —
    tcdb/etl/syntracks.py:259-262,386)."""
    return F.round(_as_col(c), scale)
