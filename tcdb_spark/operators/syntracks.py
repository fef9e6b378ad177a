"""Ensemble ("syntrack") track operators — long-format DataFrame pipeline
replacing the reference's per-object numpy/xarray processing
(tcdb/etl/syntracks.py).

Long format (schemas.SYNTRACK_SCHEMA): one row per
(model, init, ensemble, hour) with lat/lon/wind/mslp. The reference's
dense (ensemble x step) matrices exist only at the visualization edge
(operators/pivot.pivot_matrix); everything else is groupBy/window/join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.functions.scalar import haversine, valid_time

TRACK_KEYS = ["model", "init", "ensemble"]


def drop_empty_tracks(df: DataFrame) -> DataFrame:
    """Remove all-NaN ensemble members (``Syntrack.empty``/``validSteps``,
    tcdb/etl/syntracks.py:80-93): a track is kept iff it has at least one
    non-null position."""
    counts = df.groupBy(*TRACK_KEYS).agg(
        F.count(F.when(F.col("lat").isNotNull(), 1)).alias("__n_valid")
    )
    return (
        df.join(counts, on=TRACK_KEYS, how="inner")
        .where(F.col("__n_valid") >= 1)
        .drop("__n_valid")
    )


def assign_tracks_to_invest(
    tracks: DataFrame,
    invests: DataFrame,
    time_threshold_days: float = 1.5,
    dist_lo_nm: float = 310.0,
    dist_hi_nm: float = 1450.0,
    max_step: int = 240,
    step_hours: int = 6,
) -> DataFrame:
    """Assign unassigned (annual_id == 0) ensemble tracks to invests.

    Reference semantics (tcdb/etl/syntracks.py:281-375):
    - per (model, init, ensemble), tracks already carrying the invest's
      annual_id stay assigned;
    - otherwise candidate tracks must have annual_id == 0, first-step
      valid time within ``time_threshold_days`` of the invest's valid
      time, and first-step position within a distance threshold that
      ramps linearly from ``dist_lo_nm`` (step 0) to ``dist_hi_nm``
      (last step) by the track's first available step
      (np.linspace(310, 1450, n_steps), :296-297);
    - tie-break: the LONGEST candidate track wins (:366-371).

    Set-based: first-step extraction is one min_by aggregation, candidate
    generation is an equi-join on (model, init) — invests per cycle are a
    tiny broadcast side — and the winner is a window argmax on
    (track_len desc, distance asc, ensemble asc). No per-ensemble loops.

    Input ``invests``: (model, init, annual_id, name, lat, lon, valid).
    Output: tracks with ``annual_id``/``storm_name`` filled for matched
    members.
    """
    n_steps = max_step // step_hours + 1
    ramp_per_step = (dist_hi_nm - dist_lo_nm) / max(n_steps - 1, 1)

    firsts = (
        tracks.where(F.col("lat").isNotNull())
        .groupBy(*TRACK_KEYS)
        .agg(
            F.min("hour").alias("first_hour"),
            F.min_by("lat", F.col("hour")).alias("first_lat"),
            F.min_by("lon", F.col("hour")).alias("first_lon"),
            F.count(F.lit(1)).alias("track_len"),
            # the pre-assigned invest id is constant across a track's
            # rows when present; max (null-skipping) reads it without
            # depending on partition order the way first() would under
            # task retry (round-8 determinism audit)
            F.max("annual_id").alias("annual_id"),
        )
        .withColumn("first_valid", valid_time("init", F.col("first_hour")))
        .withColumn(
            "dist_threshold",
            F.lit(dist_lo_nm) + (F.col("first_hour") / step_hours) * ramp_per_step,
        )
    )

    inv = invests.select(
        "model",
        "init",
        F.col("annual_id").alias("inv_annual_id"),
        F.col("name").alias("inv_name"),
        F.col("lat").alias("inv_lat"),
        F.col("lon").alias("inv_lon"),
        F.col("valid").alias("inv_valid"),
    )

    cand = (
        firsts.where(F.col("annual_id") == 0)
        .join(F.broadcast(inv), on=["model", "init"])
        .withColumn(
            "__dt_days",
            (F.unix_timestamp("first_valid") - F.unix_timestamp("inv_valid")) / 86400.0,
        )
        .where(F.col("__dt_days") < time_threshold_days)
        .withColumn(
            "__dist", haversine("first_lat", "first_lon", "inv_lat", "inv_lon", "nm")
        )
        .where(F.col("__dist") <= F.col("dist_threshold"))
    )
    w = W.partitionBy("model", "init", "ensemble", "inv_annual_id").orderBy(
        F.col("track_len").desc(), F.col("__dist").asc()
    )
    winners = (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*TRACK_KEYS, "inv_annual_id", "inv_name")
    )

    out = tracks.join(F.broadcast(winners), on=TRACK_KEYS, how="left")
    return (
        out.withColumn(
            "annual_id",
            F.when(
                (F.col("annual_id") == 0) & F.col("inv_annual_id").isNotNull(),
                F.col("inv_annual_id"),
            ).otherwise(F.col("annual_id")),
        )
        .withColumn(
            "storm_name",
            F.when(F.col("inv_annual_id").isNotNull() & F.col("inv_name").isNotNull(), F.col("inv_name"))
            .otherwise(F.col("storm_name")),
        )
        .drop("inv_annual_id", "inv_name")
    )


def syntrack_steps(df: DataFrame, round_mslp: int = 2, round_pos: int = 3) -> DataFrame:
    """Step rows for warehouse load (``toStepDict``,
    tcdb/etl/syntracks.py:378-389): rounded positions, track hash id."""
    track_id = F.xxhash64(F.lit("syntrack"), F.col("model"), F.col("init"), F.col("ensemble"))
    return df.where(F.col("lat").isNotNull()).select(
        track_id.alias("track_id"),
        F.col("hour").cast("int").alias("hour"),
        F.round("lat", round_pos).alias("latitude"),
        F.round("lon", round_pos).alias("longitude"),
        F.round("wind", round_pos).alias("intensity_kts"),
        F.round(F.coalesce("mslp", F.lit(1000.0)), round_mslp).alias("mslp_mb"),
    )
