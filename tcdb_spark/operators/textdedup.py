"""Hot-key hygiene for inverted-index text operators.

An inverted shingle index self-joined on the shingle key is the standard
near-dup / decontamination shape, but a "hot" shingle (boilerplate text
with document frequency in the millions at crawl scale) makes the
equi-join quadratic on that one key: df^2 candidate pairs land in a
single shuffle partition.  The standard fix — used by every production
dedup pipeline — is a document-frequency cap: drop shingles with
``df > cap`` from the index *before* the join.  Hot shingles carry no
signal anyway (every doc "matches" on them), so the cap improves both
cost and precision.

AQE's skew-join split spreads a hot partition over tasks but cannot
reduce the O(df^2) pair count itself; only the cap bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(inv: DataFrame, key: str, df_cap: int) -> DataFrame:
    """Distinct values of ``key`` whose row frequency exceeds ``df_cap``.

    ``inv`` must already be per-document distinct in ``key`` (one row per
    (doc, key)) so the row count *is* the document frequency.  The result
    is tiny by construction (only keys hotter than the cap), so callers
    broadcast it.
    """
    return (
        inv.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > df_cap)
        .select(key)
    )


def drop_hot_keys(inv: DataFrame, key: str, df_cap: int) -> DataFrame:
    """Remove rows whose ``key`` has document frequency > ``df_cap``.

    One extra aggregation over the index (map-side partial, key-wise
    shuffle) buys a bounded join: afterwards no key can contribute more
    than ``df_cap``^2 pairs.  The hot set is broadcast, so the filter
    itself adds no shuffle to the main path.
    """
    return inv.join(F.broadcast(hot_keys(inv, key, df_cap)), key, "left_anti")
