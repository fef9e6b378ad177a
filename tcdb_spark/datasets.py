"""Denormalized per-storm dataset assembly — the reference's
``StormDataset`` (tcdb/datasets/storm_dataset.py:39-92) as parameterized
views over the warehouse star schema instead of ORM relationship walks.

``storm_tracks`` is the §2.4 join-track-5way plan (tracks ⋈ steps ⋈
forecasts ⋈ models ⋈ storms) with the reference's derived columns
(model short name, init, valid) and filters (model allowlist, init
range), audit columns dropped (tcdb/datasets/storm_dataset.py:82,91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tcdb_spark.functions.scalar import valid_time
from tcdb_spark.sources.warehouse import Warehouse

AUDIT = ["run_id", "last_update"]


def storm_observations(
    warehouse: Warehouse, nhc_id: str | None = None
) -> DataFrame:
    """Per-storm observation frame (tcdb/datasets/storm_dataset.py:85-92).

    Point lookups (``nhc_id`` given) route through the warehouse's
    file-stats skipping when stats exist for the observations table:
    the storm dimension resolves the surrogate key driver-side (tiny),
    and provably-disjoint observation files are pruned from the file
    list before the scan plans — at 10^5 files per table that's a
    metadata lookup instead of 10^5 footer reads.  Falls back to the
    full scan when stats are absent; the row-level filter always still
    applies, so results are identical either way."""
    storms = warehouse.read("storms")
    if nhc_id is not None:
        storms = storms.where(F.col("nhc_id") == nhc_id)
        obs = _obs_point_lookup(warehouse, storms)
    else:
        obs = warehouse.read("observations")
    return obs.join(
        F.broadcast(storms.select("storm_id", "nhc_id", "name")), on="storm_id"
    ).drop(*AUDIT)


def _obs_point_lookup(warehouse: Warehouse, storms: DataFrame) -> DataFrame:
    """Observations scan for a resolved storm set, file-stats-pruned
    when ``_STATS_v<n>.json`` exists (Warehouse.read_skipping); plain
    versioned read otherwise."""
    import os

    v = warehouse.current_version("observations")
    if v is not None and os.path.exists(warehouse._stats_path("observations", v)):
        # one-row aggregate instead of collecting the id list: only the
        # (min, max) bounds reach the driver (file pruning is a
        # driver-side metadata decision), and the exact membership
        # filter stays distributed as a broadcast semi-join
        b = storms.agg(
            F.min("storm_id").alias("lo"), F.max("storm_id").alias("hi")
        ).first()
        if b["lo"] is not None:
            obs, _info = warehouse.read_skipping(
                "observations", {"storm_id": (b["lo"], b["hi"])}
            )
            return obs.join(
                F.broadcast(storms.select("storm_id")), "storm_id", "left_semi"
            )
    return warehouse.read("observations")


def storm_tracks(
    warehouse: Warehouse,
    nhc_id: str | None = None,
    models: list[str] | None = None,
    inits: tuple | None = None,
) -> DataFrame:
    """Per-storm forecast-track frame: steps ⋈ tracks ⋈ forecasts ⋈
    models ⋈ storms with model/init filters
    (tcdb/datasets/storm_dataset.py:60-83). Dimensions broadcast; the
    steps fact never shuffles for the join."""
    from tcdb_spark.dims import models_df

    storms = warehouse.read("storms")
    tracks = warehouse.read("tracks")
    steps = warehouse.read("steps")
    forecasts = warehouse.read("forecasts")
    model_dim = models_df(steps.sparkSession).select("model_id", F.col("short_name").alias("model"))

    if nhc_id is not None:
        storms = storms.where(F.col("nhc_id") == nhc_id)

    f = forecasts.select("forecast_id", "model_id", F.col("datetime_utc").alias("init"))
    if inits is not None:
        f = f.where(F.col("init").between(*inits))

    t = tracks.select("track_id", "storm_id", "forecast_id", "ensemble_number")
    out = (
        steps.drop(*AUDIT)
        .join(t, on="track_id")
        .join(F.broadcast(storms.select("storm_id", "nhc_id", "name")), on="storm_id")
        .join(F.broadcast(f), on="forecast_id")
        .join(F.broadcast(model_dim), on="model_id")
        .withColumn("valid_utc", valid_time("init", F.col("hour")))
    )
    if models is not None:
        out = out.where(F.col("model").isin(models))
    return out.drop("model_id", "forecast_id")
