"""Core catalog: reference plan shapes (SURVEY.md §2.2-§2.7) expressed over
the driver testdata tables, each with a DuckDB oracle.

Mapping (FIXTURES.md §C): the flagship 5-way track denormalization
(db/track_queries.sql) ≈ lineitem⋈orders⋈customer⋈nation⋈region; the
count-by-model family (db/basin_model_counts.sql etc.) ≈ counts by
nation/segment; latest-record/argmin windows run on ``events``; the
scalar ATCF functions run on deterministically derived encoded columns so
the decode logic itself is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.functions.scalar import (
    cycle_floor,
    haversine,
    latlon_decode_lat,
    latlon_decode_lon,
    nhc_id,
    storm_status,
    storm_type,
    storm_uid,
    valid_time,
)
from tcdb_spark.operators.aggregates import (
    child_counts,
    count_by,
    deterministic_mode,
    grouped_counts_cube,
    minmax_dates,
)
from tcdb_spark.operators.joins import (
    asof_join,
    interval_join,
    nearest_match,
    star_denormalize,
)
from tcdb_spark.operators.windows import (
    first_last_per_group,
    latest_per_key,
    topk_per_group,
)
from tcdb_spark.plans.catalog import load_tables, register

# ---------------------------------------------------------------------------
# Flagship: 5-way star denormalization (join-track-5way,
# db/track_queries.sql:16-21 / db/forecasts_by_init.sql:16-20)
# ---------------------------------------------------------------------------


@register(
    "join_track_5way",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderdate, c_name, n_name, r_name,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    """,
)
def join_track_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact⋈dim⋈dim⋈dim denormalization — same plan shape as the
    reference's tracks⋈steps⋈storms⋈forecasts⋈models. Dims broadcast; the
    two fact tables sort-merge/shuffle-hash on the key (AQE decides)."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    li_orders = t["lineitem"].join(
        t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey
    )
    denorm = star_denormalize(
        li_orders,
        [
            (t["customer"], li_orders.o_custkey == t["customer"].c_custkey),
            (t["nation"], F.col("c_nationkey") == F.col("n_nationkey")),
            (t["region"], F.col("n_regionkey") == F.col("r_regionkey")),
        ],
    )
    return denorm.select(
        "l_orderkey",
        "l_linenumber",
        "o_orderdate",
        "c_name",
        "n_name",
        "r_name",
        # no rounding: the per-row product is bit-identical across engines,
        # while round()'s half-case tie-breaking is not
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "agg_count_by_model",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_count_by_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-per-dimension with ORDER BY count DESC
    (db/basin_model_counts.sql:1-13 plan shape)."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey")).join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return count_by(j, ["n_name"]).orderBy(F.col("n").desc())


@register(
    "agg_count_2key",
    oracle="""
    SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_mktsegment
    """,
)
def agg_count_2key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key counts with multi-key ORDER BY
    (db/storm_track_counts_by_model.sql:10-15 plan shape)."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey")).join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return count_by(j, ["n_name", "c_mktsegment"]).orderBy(
        F.col("n_name").asc(), F.col("n").desc()
    )


@register(
    "agg_minmax_dates",
    oracle="""
    SELECT o_custkey, min(o_orderdate) AS start_date, max(o_orderdate) AS end_date
    FROM orders GROUP BY o_custkey
    """,
)
def agg_minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max DATETIME per group (tcdb/etl/atcf.py:318-319)."""
    t = load_tables(spark, sf_dir, "orders")
    return minmax_dates(t["orders"], ["o_custkey"], "o_orderdate")


@register(
    "agg_mode",
    oracle="""
    WITH counted AS (
        SELECT o_custkey, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, o_orderpriority AS mode_value
    FROM counted
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY cnt DESC, o_orderpriority ASC) = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic most-frequent value per group
    (STORMNAME mode fill, tcdb/etl/atcf.py:168-169)."""
    t = load_tables(spark, sf_dir, "orders")
    return deterministic_mode(t["orders"], ["o_custkey"], "o_orderpriority")


@register(
    "agg_max_intensity",
    oracle="""
    SELECT user_id, max(value) AS max_value, min(value) AS min_value,
           round(avg(value), 4) AS avg_value, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_max_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max-intensity style per-group extremes (tcdb/etl/atcf.py:308)."""
    t = load_tables(spark, sf_dir, "events")
    return t["events"].groupBy("user_id").agg(
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 8-agg groupBy — exercises pushdown,
    partial aggregation and whole-stage codegen end to end."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function family (§2.2) — encoded columns derived deterministically
# from keys, so the decode/classify logic is what gets oracle-checked.
# ---------------------------------------------------------------------------


@register(
    "fn_latlon_decode",
    oracle="""
    WITH enc AS (
        SELECT c_custkey,
               concat(CAST(c_custkey % 900 AS VARCHAR),
                      CASE WHEN c_custkey % 2 = 0 THEN 'N' ELSE 'S' END) AS lat_str,
               concat(CAST((c_custkey * 7) % 1800 AS VARCHAR),
                      CASE WHEN c_custkey % 3 = 0 THEN 'W' ELSE 'E' END) AS lon_str
        FROM customer
    )
    SELECT c_custkey, lat_str, lon_str,
           CASE WHEN lat_str LIKE '%N'
                THEN CAST(substring(lat_str, 1, length(lat_str) - 1) AS DOUBLE) / 10
                ELSE -(CAST(substring(lat_str, 1, length(lat_str) - 1) AS DOUBLE) / 10)
           END AS lat,
           CASE WHEN lon_str LIKE '%W'
                THEN -(CAST(substring(lon_str, 1, length(lon_str) - 1) AS DOUBLE) / 10)
                ELSE CAST(substring(lon_str, 1, length(lon_str) - 1) AS DOUBLE) / 10
           END AS lon
    FROM enc
    """,
)
def fn_latlon_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATCF hemisphere-suffixed tenths decode (tcdb/etl/atcf.py:74-75)."""
    c = load_tables(spark, sf_dir, "customer")["customer"]
    enc = c.select(
        "c_custkey",
        F.concat(
            (F.col("c_custkey") % 900).cast("string"),
            F.when(F.col("c_custkey") % 2 == 0, F.lit("N")).otherwise(F.lit("S")),
        ).alias("lat_str"),
        F.concat(
            ((F.col("c_custkey") * 7) % 1800).cast("string"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit("W")).otherwise(F.lit("E")),
        ).alias("lon_str"),
    )
    return enc.select(
        "c_custkey",
        "lat_str",
        "lon_str",
        latlon_decode_lat("lat_str").alias("lat"),
        latlon_decode_lon("lon_str").alias("lon"),
    )


@register(
    "fn_storm_type",
    oracle="""
    WITH tagged AS (
        SELECT event_id, value AS wind,
               CASE event_type WHEN 'error' THEN 'AL' WHEN 'view' THEN 'WP'
                    WHEN 'signup' THEN 'IO' WHEN 'click' THEN 'SH'
                    ELSE 'EP' END AS region
        FROM events
    )
    SELECT event_id, region, wind,
           CASE
             WHEN region IN ('AL','EP') THEN
               CASE WHEN wind < 34 THEN 'TD' WHEN wind < 63 THEN 'TS' ELSE 'HU' END
             WHEN region = 'WP' THEN
               CASE WHEN wind < 34 THEN 'TD' WHEN wind < 63 THEN 'TS'
                    WHEN wind < 130 THEN 'TY' ELSE 'STY' END
             WHEN region = 'SH' THEN CASE WHEN wind < 63 THEN 'TC' ELSE 'STC' END
             WHEN region = 'IO' THEN
               CASE WHEN wind < 28 THEN 'DE' WHEN wind < 34 THEN 'DD'
                    WHEN wind < 48 THEN 'CS' WHEN wind < 64 THEN 'SCS'
                    WHEN wind < 90 THEN 'VSCS' WHEN wind < 120 THEN 'ESCS'
                    ELSE 'SuCS' END
             ELSE 'CY'
           END AS storm_type
    FROM tagged
    """,
)
def fn_storm_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basin-aware intensity classification (tcdb/utils.py:71-121)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    tagged = e.select(
        "event_id",
        F.col("value").alias("wind"),
        F.when(F.col("event_type") == "error", "AL")
        .when(F.col("event_type") == "view", "WP")
        .when(F.col("event_type") == "signup", "IO")
        .when(F.col("event_type") == "click", "SH")
        .otherwise("EP")
        .alias("region"),
    )
    return tagged.select(
        "event_id", "region", "wind", storm_type("wind", "region").alias("storm_type")
    )


@register(
    "fn_nhc_id",
    oracle="""
    SELECT n_nationkey,
           upper(printf('%s%02d%d',
                 CASE n_nationkey % 6 WHEN 0 THEN 'al' WHEN 1 THEN 'ep' WHEN 2 THEN 'cp'
                      WHEN 3 THEN 'wp' WHEN 4 THEN 'io' ELSE 'sh' END,
                 CAST(n_nationkey % 99 + 1 AS INTEGER),
                 CAST(2020 + n_nationkey % 5 AS INTEGER))) AS nhc_id
    FROM nation
    """,
)
def fn_nhc_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nhc_id composition BASIN+%02d+season (tcdb/etl/atcf.py:323)."""
    n = load_tables(spark, sf_dir, "nation")["nation"]
    basin = (
        F.when(F.col("n_nationkey") % 6 == 0, "al")
        .when(F.col("n_nationkey") % 6 == 1, "ep")
        .when(F.col("n_nationkey") % 6 == 2, "cp")
        .when(F.col("n_nationkey") % 6 == 3, "wp")
        .when(F.col("n_nationkey") % 6 == 4, "io")
        .otherwise("sh")
    )
    return n.select(
        "n_nationkey",
        nhc_id(basin, F.col("n_nationkey") % 99 + 1, F.lit(2020) + F.col("n_nationkey") % 5).alias("nhc_id"),
    )


@register(
    "fn_haversine",
    oracle="""
    SELECT c_custkey, s_suppkey,
           round(2.0 * asin(sqrt(
               pow(sin((radians(CAST(c_custkey % 180 AS DOUBLE) - 90.0)
                      - radians(CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90.0)) / 2), 2)
             + cos(radians(CAST(c_custkey % 180 AS DOUBLE) - 90.0))
               * cos(radians(CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90.0))
               * pow(sin((radians(CAST((c_custkey * 3) % 360 AS DOUBLE) - 180.0)
                        - radians(CAST((s_suppkey * 29) % 360 AS DOUBLE) - 180.0)) / 2), 2)
           )) * (180.0 / pi()) * 60.0, 4) AS distance_nm
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    """,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance as a pure column expression
    (tcdb/utils.py:49-69). Coordinates derived from keys.

    NOTE the oracle applies radians() to the *degree* value then subtracts,
    mirroring haversine()'s (radians(lat1)-radians(lat2)) order exactly so
    both engines execute the same IEEE operation sequence.
    """
    t = load_tables(spark, sf_dir, "customer", "supplier")
    j = t["customer"].join(t["supplier"], F.col("c_nationkey") == F.col("s_nationkey"))
    lat1 = (F.col("c_custkey") % 180).cast("double") - 90.0
    lon1 = ((F.col("c_custkey") * 3) % 360).cast("double") - 180.0
    lat2 = ((F.col("s_suppkey") * 13) % 180).cast("double") - 90.0
    lon2 = ((F.col("s_suppkey") * 29) % 360).cast("double") - 180.0
    return j.select(
        "c_custkey",
        "s_suppkey",
        F.round(haversine(lat1, lon1, lat2, lon2, "nm"), 4).alias("distance_nm"),
    )


@register(
    "fn_cycle_floor",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000) AS cycle,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def fn_cycle_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synoptic 6-hour cycle floor + per-cycle rollup
    (tcdb/pipeline/adeck.py:243-246) — the tumbling-window batch shape."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return (
        e.withColumn("cycle", cycle_floor("ts", 6))
        .groupBy("cycle")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "fn_valid_time",
    oracle="""
    SELECT event_id, CAST(event_id % 168 AS INTEGER) AS hour,
           ts + to_hours(event_id % 168) AS valid_utc
    FROM events
    """,
)
def fn_valid_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """valid = init + forecast-hour (tcdb/models/steps.py:64-66)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return e.select(
        "event_id",
        (F.col("event_id") % 168).cast("int").alias("hour"),
        valid_time("ts", F.col("event_id") % 168).alias("valid_utc"),
    )


@register(
    "fn_status",
    oracle="""
    SELECT event_id, ts,
           CASE WHEN epoch(TIMESTAMP '2024-01-04 00:00:00') - epoch(ts) <= 16 * 3600
                THEN 'Active' ELSE 'Archive' END AS status
    FROM events
    """,
)
def fn_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active/Archive freshness flag (tcdb/etl/process_storms.py:205-208)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    now = F.lit("2024-01-04 00:00:00").cast("timestamp")
    return e.select("event_id", "ts", storm_status("ts", now, 16).alias("status"))


@register(
    "fn_storm_uid",
    oracle="""
    SELECT event_id,
           printf('%s%s.%02d',
                  CASE event_type WHEN 'error' THEN 'AL' WHEN 'view' THEN 'WP'
                       WHEN 'signup' THEN 'IO' WHEN 'click' THEN 'SH' ELSE 'EP' END,
                  strftime(ts, '%Y%m%d%H'),
                  CAST(user_id % 90 AS INTEGER)) AS uid
    FROM events
    """,
)
def fn_storm_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural uid {basin}{yyyyMMddHH}.{lat:02d}
    (tcdb/pipeline/process_obs.py:17-27)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    basin = (
        F.when(F.col("event_type") == "error", "AL")
        .when(F.col("event_type") == "view", "WP")
        .when(F.col("event_type") == "signup", "IO")
        .when(F.col("event_type") == "click", "SH")
        .otherwise("EP")
    )
    return e.select(
        "event_id", storm_uid(basin, F.col("ts"), F.col("user_id") % 90).alias("uid")
    )


# ---------------------------------------------------------------------------
# Window family (§2.7)
# ---------------------------------------------------------------------------


@register(
    "topk_latest_event",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def topk_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record dedup window (newest file version / last annual id —
    tcdb/pipeline/bdeck.py:105-108, tcdb/etl/process_storms.py:222-229)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return latest_per_key(e, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


@register(
    "window_first_last",
    oracle="""
    SELECT user_id,
           first(value ORDER BY ts, event_id) AS first_value,
           last(value ORDER BY ts, event_id) AS last_value,
           first(event_type ORDER BY ts, event_id) AS first_event_type,
           last(event_type ORDER BY ts, event_id) AS last_event_type
    FROM events GROUP BY user_id
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """values[0]/values[-1] per group via min_by/max_by on a composite
    ordering (tcdb/etl/atcf.py:310-325,364-367)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    out = first_last_per_group(e, ["user_id"], "ts", ["value", "event_type"], tiebreak="event_id")
    return out.select(
        "user_id", "first_value", "last_value", "first_event_type", "last_event_type"
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
             AS INTEGER) AS rank_in_group
    FROM orders
    QUALIFY rank_in_group <= 3
    """,
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (k=1 argmin/argmax generalized —
    tcdb/etl/process_storms.py:43-56, tcdb/etl/syntracks.py:366-371)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return topk_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_group")


# ---------------------------------------------------------------------------
# Pivot (§2.6)
# ---------------------------------------------------------------------------


@register(
    "pivot_event_values",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with known pivot values (wind-radii reshape shape,
    tcdb/etl/atcf.py:340-385): conditional aggregation keeps it one
    groupBy with a fixed schema — no distinct-values discovery job."""
    e = load_tables(spark, sf_dir, "events")["events"]
    aggs = [
        F.round(F.sum(F.when(F.col("event_type") == v, F.col("value"))), 2).alias(v)
        for v in ["click", "error", "purchase", "signup", "view"]
    ]
    return e.groupBy("user_id").agg(*aggs)


# ---------------------------------------------------------------------------
# Non-equi / similarity joins (§2.4)
# ---------------------------------------------------------------------------


@register(
    "join_interval_1h",
    oracle="""
    SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND abs(epoch(p.ts) - epoch(c.ts)) <= 3600
    GROUP BY p.user_id
    """,
)
def join_interval_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join |t1-t2| <= tolerance via bucketized equi pre-join
    (24 h start-date drift matching, tcdb/etl/process_storms.py:104-117)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    )
    j = interval_join(purchases, clicks, ["user_id"], "ts", "click_ts", tolerance_hours=1.0)
    return j.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at or before each purchase, per user —
    the time-nearest matching of track assignment
    (tcdb/etl/syntracks.py:281-325) without a cross product."""
    e = load_tables(spark, sf_dir, "events")["events"]
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join(purchases, clicks, ["user_id"], "ts", "click_ts", ["click_ts"])
    return out.select("event_id", "user_id", "ts", "click_ts")


@register(
    "join_asof_bucketed",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resistant twin of `join_asof` — identical semantics and
    oracle, but the window runs per (user, 24h bucket) with a carried
    boundary instead of per raw user, so a megahot entity splits across
    time buckets instead of owning one reducer (asof_join_bucketed,
    operators/joins.py; 20.5 s -> 7.4 s on the planted-90%-one-key
    smoke, SCALE_SMOKE.md round 6)."""
    from tcdb_spark.operators.joins import asof_join_bucketed

    e = load_tables(spark, sf_dir, "events")["events"]
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join_bucketed(
        purchases, clicks, ["user_id"], "ts", "click_ts", ["click_ts"],
        bucket_hours=24.0,
    )
    return out.select("event_id", "user_id", "ts", "click_ts")


@register(
    "join_entity_resolution",
    oracle="""
    WITH cand AS (
        SELECT c_custkey, s_suppkey,
               2.0 * asin(sqrt(
                   pow(sin((radians(CAST(c_custkey % 180 AS DOUBLE) - 90.0)
                          - radians(CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90.0)) / 2), 2)
                 + cos(radians(CAST(c_custkey % 180 AS DOUBLE) - 90.0))
                   * cos(radians(CAST((s_suppkey * 13) % 180 AS DOUBLE) - 90.0))
                   * pow(sin((radians(CAST((c_custkey * 3) % 360 AS DOUBLE) - 180.0)
                            - radians(CAST((s_suppkey * 29) % 360 AS DOUBLE) - 180.0)) / 2), 2)
               )) * (180.0 / pi()) * 60.0 AS distance_nm
        FROM customer JOIN supplier ON c_nationkey = s_nationkey
    )
    SELECT c_custkey, s_suppkey, round(distance_nm, 4) AS distance_nm
    FROM cand
    WHERE distance_nm <= 3000
    QUALIFY row_number() OVER (
        PARTITION BY c_custkey ORDER BY distance_nm ASC, s_suppkey ASC) = 1
    """,
)
def join_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor entity resolution: candidate equi-join + haversine +
    threshold + window argmin (getClosestStorm / investSearch,
    tcdb/etl/process_storms.py:24-125)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].select(
        "c_custkey",
        "c_nationkey",
        ((F.col("c_custkey") % 180).cast("double") - 90.0).alias("c_lat"),
        (((F.col("c_custkey") * 3) % 360).cast("double") - 180.0).alias("c_lon"),
    )
    supp = t["supplier"].select(
        "s_suppkey",
        F.col("s_nationkey").alias("c_nationkey"),
        (((F.col("s_suppkey") * 13) % 180).cast("double") - 90.0).alias("s_lat"),
        (((F.col("s_suppkey") * 29) % 360).cast("double") - 180.0).alias("s_lon"),
    )
    out = nearest_match(
        cust,
        supp,
        on=["c_nationkey"],
        left_latlon=("c_lat", "c_lon"),
        right_latlon=("s_lat", "s_lon"),
        max_distance_nm=3000.0,
        left_key="c_custkey",
        tiebreak=["s_suppkey"],
    )
    return out.select("c_custkey", "s_suppkey", F.round("distance_nm", 4).alias("distance_nm"))


# ---------------------------------------------------------------------------
# Remaining agg family
# ---------------------------------------------------------------------------


@register(
    "agg_child_counts",
    oracle="""
    SELECT c_custkey, CAST(coalesce(o.cnt, 0) AS BIGINT) AS n_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) o
           ON c_custkey = o_custkey
    """,
)
def agg_child_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-side child counts (num_observations/num_tracks,
    tcdb/models/storms.py:66-68)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    orders = t["orders"].withColumnRenamed("o_custkey", "c_custkey")
    return child_counts(t["customer"], orders, "c_custkey", "n_orders").select(
        "c_custkey", "n_orders"
    )


@register(
    "agg_cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cube() superset of the reference's basin x model count family
    (SURVEY.md §2.5) — one shuffle for all groupings."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return grouped_counts_cube(li, ["l_returnflag", "l_linestatus"])


@register(
    "filter_freshness",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 24 HOUR FROM events)
    """,
)
def filter_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-window predicate (<=24 h of reference time,
    tcdb/pipeline/adeck.py:96-104) against the live max event time."""
    e = load_tables(spark, sf_dir, "events")["events"]
    ref = e.agg(F.max("ts").alias("__max_ts"))
    return (
        e.crossJoin(F.broadcast(ref))
        .where(F.col("ts") >= F.col("__max_ts") - F.expr("INTERVAL 24 HOURS"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> grouped
    revenue -> global top-10.  The plan to want at 100 TB: the segment
    filter broadcasts a shrunken customer dim, both date predicates push
    to the scans, and the LIMIT is a TakeOrderedAndProject (per-partition
    top-k then a k-row driver merge, never a full sort).  Deterministic
    (revenue, l_orderkey) tiebreak on both engines."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1998-03-15 00:00:00").cast("timestamp")
    j = (
        t["customer"].where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cut)
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cut)
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_nationkey = c_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with the customer-nation ==
    supplier-nation co-location predicate.  Dims (nation, region,
    supplier) broadcast; the fact chain shuffles once on the join keys;
    the local-supplier equality is a residual filter on the supplier
    join, not a cross product."""
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    j = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
