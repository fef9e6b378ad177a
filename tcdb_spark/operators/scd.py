"""Slowly-changing-dimension (SCD Type 2) history maintenance.

The reference keeps only the latest value of mutable storm attributes
(tcdb/etl/process_storms.py updates rows in place; the audit trail is a
run-id restamp, tcdb/models/storms.py). An engine serving analytics at
100 TB also needs the *history-preserving* form: every attribute change
closes the open version row and inserts a new one, so point-in-time
joins ("which segment was this customer in when the order shipped?")
stay answerable. This is the standard lakehouse SCD2 MERGE, expressed
as one set-based plan:

- one shuffle each side on the business key (bucketing the dim on the
  key removes the table side at scale, same as ``operators/merge.py``);
- change detection is a null-safe struct comparison (no per-column
  Python, codegen end-to-end);
- the snapshot is authoritative per key: a key absent from the snapshot
  is left untouched (dims rarely shrink; deletes are an explicit op).

All writes produce a NEW frame (versioned-warehouse friendly); nothing
mutates in place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("effective_from", "effective_to", "is_current")


def _tracked_struct(prefix: str, tracked: list[str]) -> Column:
    return F.struct(*[F.col(f"{prefix}.{c}") for c in tracked])


def scd2_init(snapshot: DataFrame, effective_from) -> DataFrame:
    """Open a first version row for every key in the initial snapshot."""
    return (
        snapshot.withColumn("effective_from", F.lit(effective_from).cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    current: DataFrame,
    snapshot: DataFrame,
    key: list[str],
    tracked: list[str],
    effective_from,
) -> DataFrame:
    """Fold a new attribute snapshot into an SCD2 history table.

    ``current``: history rows carrying ``effective_from``,
    ``effective_to`` (NULL = open) and ``is_current``. ``snapshot``:
    one row per key with the tracked attribute columns as of
    ``effective_from``. Returns the new history:

    - changed keys: the open row is closed (``effective_to`` set,
      ``is_current`` false) and a new open row is inserted;
    - unchanged / absent keys: rows pass through untouched;
    - brand-new keys: inserted as open rows.

    Idempotent: re-applying the same snapshot changes nothing (change
    detection is value-based, null-safe).
    """
    ts = F.lit(effective_from).cast("timestamp")
    open_rows = current.where(F.col("is_current")).alias("o")
    closed_rows = current.where(~F.col("is_current"))
    snap = snapshot.alias("s")

    on = [F.col(f"o.{k}") == F.col(f"s.{k}") for k in key]
    joined = open_rows.join(snap, on=on, how="full_outer")
    in_snap = F.col(f"s.{key[0]}").isNotNull()
    in_open = F.col(f"o.{key[0]}").isNotNull()
    changed = in_snap & in_open & ~_tracked_struct("o", tracked).eqNullSafe(
        _tracked_struct("s", tracked)
    )

    open_cols = [F.col(f"o.{c}") for c in current.columns]
    # open rows that survive as-is: unchanged match, or key absent from snapshot
    survivors = joined.where(in_open & ~changed).select(*open_cols)
    # changed keys: emit the closed-out predecessor
    closed_out = (
        joined.where(changed)
        .select(*open_cols)
        .withColumn("effective_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    # changed keys + brand-new keys: emit the new open version
    new_open = (
        joined.where(in_snap & (changed | ~in_open))
        .select(*[F.col(f"s.{c}") for c in snapshot.columns])
        .withColumn("effective_from", ts)
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    return (
        closed_rows.unionByName(survivors)
        .unionByName(closed_out)
        .unionByName(new_open)
    )


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """Point-in-time view: the version row live at timestamp ``at``
    (effective_from <= at < effective_to, open-ended rows included) —
    the join target for temporal enrichment."""
    ts = F.lit(at).cast("timestamp")
    return history.where(
        (F.col("effective_from") <= ts)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > ts))
    )
