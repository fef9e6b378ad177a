"""Invest <-> named-storm entity resolution (SURVEY.md §2.4
``join-entity-resolution`` / §7 step 4).

The reference matches one incoming storm at a time with sequential,
order-dependent logic (tcdb/etl/process_storms.py:24-168):

- ``getClosestStorm`` (:24-60): among candidates, argmin haversine
  distance between start positions, <=100 nm else no match;
- ``investSearch`` (:63-125): an incoming *named* storm looks for an
  existing *invest* (nhc_number >= 90) in the same region whose start_date
  matches (JTWC drift: within 24 h) and start position within 100 nm —
  that invest is "upgraded" to the named storm;
- ``namedStormSearch`` (:128-168): an incoming *invest* conversely looks
  for an existing named storm (nhc_number <= 50) it duplicates.

Here resolution is one deterministic set-based plan per direction:
equi-join on region + 24 h banded start-date + 100 nm threshold + window
argmin (distance, then storm key as tiebreak). No ordering effects: ties
resolve identically regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.functions.scalar import haversine

INVEST_MIN = 90   # incoming nhc_number >= 90 -> invest (tcdb/etl/process_storms.py:211)
UPGRADE_SEARCH_MIN = 70  # existing invests searched for upgrade use >= 70
                         # (tcdb/etl/process_storms.py:149 — looser than the
                         # incoming gate, catching renumbered invests)
NAMED_MAX = 50    # nhc_number <= 50 -> named  (tcdb/pipeline/routines.py:53)
MATCH_NM = 100.0  # distance threshold (tcdb/etl/process_storms.py:56)
DRIFT_H = 24.0    # start-date drift window (tcdb/etl/process_storms.py:104-117)


def _nearest_in_band(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_nm: float = MATCH_NM,
    drift_hours: float = DRIFT_H,
) -> DataFrame:
    """Candidates = same basin, |start_date delta| <= drift; score by
    haversine(start positions); keep nearest per left row under the
    threshold. Returns (left_key, right_key, distance_nm, start_delta_s).

    Scale: both sides are storm catalogs (small dims) — the join is
    broadcast-able; the band is bucketized by ``interval_join`` semantics
    inline (floor to drift-sized buckets, +/-1 bucket) so Catalyst plans a
    hash join, not a BNLJ.
    """
    tol_s = int(drift_hours * 3600)
    l = left.select(
        F.col(left_key),
        F.col("basin").alias("__basin"),
        F.col("start_date").alias("__lts"),
        F.col("start_lat").alias("__llat"),
        F.col("start_lon").alias("__llon"),
    ).withColumn("__lb", F.floor(F.unix_timestamp("__lts") / tol_s))
    r = right.select(
        F.col(right_key),
        F.col("basin").alias("__basin"),
        F.col("start_date").alias("__rts"),
        F.col("start_lat").alias("__rlat"),
        F.col("start_lon").alias("__rlon"),
    ).withColumn("__rb", F.floor(F.unix_timestamp("__rts") / tol_s))
    r = r.withColumn("__rb", F.explode(F.array(F.col("__rb") - 1, F.col("__rb"), F.col("__rb") + 1)))

    j = (
        l.join(r.withColumnRenamed("__basin", "__rbasin"),
               (F.col("__basin") == F.col("__rbasin")) & (F.col("__lb") == F.col("__rb")))
        .where(F.abs(F.unix_timestamp("__lts") - F.unix_timestamp("__rts")) <= tol_s)
        .withColumn("distance_nm", haversine("__llat", "__llon", "__rlat", "__rlon", "nm"))
        .where(F.col("distance_nm") <= max_nm)
        .withColumn("start_delta_s", F.abs(F.unix_timestamp("__lts") - F.unix_timestamp("__rts")))
    )
    w = W.partitionBy(left_key).orderBy(
        F.col("distance_nm").asc(), F.col("start_delta_s").asc(), F.col(right_key).asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(left_key, right_key, "distance_nm", "start_delta_s")
    )


def resolve_storms(incoming: DataFrame, existing: DataFrame) -> DataFrame:
    """Assign each incoming storm row the natural key it should MERGE on.

    Input schemas need: nhc_id, nhc_number, basin, season, start_date,
    end_date, start_lat, start_lon (plus payload columns, carried through).
    ``existing`` additionally needs storm_id.

    Resolution order (mirrors processStorms, tcdb/etl/process_storms.py:
    190-243, made set-based):
      1. exact nhc_id + start_date within 24 h  -> same storm;
      2. incoming named (<= NAMED_MAX) upgrades nearest existing invest
         (>= INVEST_MIN) within 100 nm / 24 h    -> invest's storm_id,
         incoming identity (name, nhc_id) wins;
      3. incoming invest (>= INVEST_MIN) matching an existing named storm
         has already transitioned -> labeled ``duplicate_invest`` so the
         caller DROPS it (the reference makes no updates to transitioned
         invests: investSearch returns None and the record is skipped,
         tcdb/etl/process_storms.py:95-98,212-214);
      4. otherwise                               -> brand-new storm.

    Output: incoming columns + ``matched_storm_id`` (null -> insert) +
    ``match_rule`` in {exact, upgrade, duplicate_invest, new}.
    """
    inc = incoming.alias("inc")
    ex = existing.alias("ex")

    # Rule 1: exact nhc_id, banded start date; multiple in-band existing
    # rows resolve deterministically by (start-date delta, storm_id) — the
    # same tiebreak discipline as _nearest_in_band, so ties cannot flap
    # with arrival order
    exact_w = W.partitionBy("nhc_id").orderBy(
        F.col("__delta_s").asc(), F.col("matched_storm_id").asc()
    )
    exact = (
        inc.join(ex, on=[F.col("inc.nhc_id") == F.col("ex.nhc_id")], how="inner")
        .where(
            F.abs(
                F.unix_timestamp("inc.start_date") - F.unix_timestamp("ex.start_date")
            ) <= int(DRIFT_H * 3600)
        )
        .select(
            F.col("inc.nhc_id").alias("nhc_id"),
            F.col("ex.storm_id").alias("matched_storm_id"),
            F.abs(
                F.unix_timestamp("inc.start_date") - F.unix_timestamp("ex.start_date")
            ).alias("__delta_s"),
        )
        .withColumn("__rn", F.row_number().over(exact_w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__delta_s")
    )

    # Rule 2: named incoming <- existing invest ----------------------------
    named_inc = incoming.where(F.col("nhc_number") <= NAMED_MAX)
    invests_ex = existing.where(F.col("nhc_number") >= UPGRADE_SEARCH_MIN)
    upgrades = _nearest_in_band(
        named_inc.withColumnRenamed("nhc_id", "inc_nhc_id"),
        invests_ex.select("storm_id", "basin", "start_date", "start_lat", "start_lon"),
        "inc_nhc_id",
        "storm_id",
    ).select(F.col("inc_nhc_id").alias("nhc_id"), F.col("storm_id").alias("matched_storm_id"))

    # Rule 3: invest incoming -> existing named ----------------------------
    invest_inc = incoming.where(F.col("nhc_number") >= INVEST_MIN)
    named_ex = existing.where(F.col("nhc_number") <= NAMED_MAX)
    dup_invest = _nearest_in_band(
        invest_inc.withColumnRenamed("nhc_id", "inc_nhc_id"),
        named_ex.select("storm_id", "basin", "start_date", "start_lat", "start_lon"),
        "inc_nhc_id",
        "storm_id",
    ).select(F.col("inc_nhc_id").alias("nhc_id"), F.col("storm_id").alias("matched_storm_id"))

    exact = exact.withColumn("match_rule", F.lit("exact"))
    upgrades = upgrades.withColumn("match_rule", F.lit("upgrade"))
    dup_invest = dup_invest.withColumn("match_rule", F.lit("duplicate_invest"))

    # precedence: exact > upgrade > duplicate_invest (one match per nhc_id)
    ranked = (
        exact.unionByName(upgrades).unionByName(dup_invest)
        .withColumn(
            "__prio",
            F.when(F.col("match_rule") == "exact", 0)
            .when(F.col("match_rule") == "upgrade", 1)
            .otherwise(2),
        )
    )
    w = W.partitionBy("nhc_id").orderBy("__prio", "matched_storm_id")
    best = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("nhc_id", "matched_storm_id", "match_rule")
    )

    out = incoming.join(F.broadcast(best), on="nhc_id", how="left")
    return out.withColumn("match_rule", F.coalesce(F.col("match_rule"), F.lit("new")))
