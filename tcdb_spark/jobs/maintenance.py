"""Maintenance job (reference: tcdb/pipeline/routines.py +
master_maintnence.sh): status archival sweep + old-invest cleanup with
cascade, as Delta-style UPDATE/DELETE over the warehouse.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.merge import cascade_delete
from tcdb_spark.schemas import (
    OBSERVATIONS_SCHEMA,
    STORMS_SCHEMA,
    TRACKS_SCHEMA,
)
from tcdb_spark.sources.warehouse import Warehouse


def update_active_systems(
    spark: SparkSession, warehouse: Warehouse, run_id: str, now=None, idle_hours: int = 24
) -> int:
    """Flip status Active->Archive when now - end_date > idle_hours
    (updateActiveSystems, tcdb/pipeline/routines.py:14-31). Returns the
    number of archived rows."""
    now = now if now is not None else F.current_timestamp()
    storms = warehouse.read("storms", STORMS_SCHEMA)
    stale = (F.col("status") == "Active") & (
        (now.cast("long") - F.col("end_date").cast("long")) > idle_hours * 3600
    )
    # count against the pre-update frame: ``stale`` references status,
    # which the update itself rewrites
    n = storms.where(stale).count()
    updated = storms.withColumn(
        "status", F.when(stale, F.lit("Archive")).otherwise(F.col("status"))
    ).withColumn(
        "run_id", F.when(stale, F.lit(run_id)).otherwise(F.col("run_id"))
    )
    warehouse.write("storms", updated)
    return n


def remove_old_invests(
    spark: SparkSession, warehouse: Warehouse, now=None, max_age_days: int = 30
) -> dict[str, int]:
    """Delete invests (nhc_number >= 90) idle for > max_age_days, cascading
    observations and tracks (removeOldInvests, tcdb/pipeline/routines.py:
    33-65; cascade via ORM relationships tcdb/models/storms.py:30-31 —
    here an ordered multi-table anti-join delete)."""
    now = now if now is not None else F.current_timestamp()
    storms = warehouse.read("storms", STORMS_SCHEMA)
    obs = warehouse.read("observations", OBSERVATIONS_SCHEMA)
    tracks = warehouse.read("tracks", TRACKS_SCHEMA)

    doomed_pred = (F.col("nhc_number") >= 90) & (
        (now.cast("long") - F.col("end_date").cast("long")) > max_age_days * 86400
    )
    new_storms, children = cascade_delete(
        storms,
        {"observations": (obs, "storm_id"), "tracks": (tracks, "storm_id")},
        doomed_pred,
        "storm_id",
    )
    removed = storms.count() - new_storms.count()
    # cascade delete commits all-or-nothing (the ORM session's FK
    # cascade): a crash can never leave observations/tracks orphaned
    # from already-deleted parent storms
    with warehouse.transaction(["storms", "observations", "tracks"]) as txn:
        txn.write("storms", new_storms)
        txn.write("observations", children["observations"])
        txn.write("tracks", children["tracks"])
    return {"removed_storms": removed}
