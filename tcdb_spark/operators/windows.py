"""Window-family operators: latest-record dedup, top-k per group,
first/last per group (SURVEY.md §2.7).

All are single-shuffle plans partitioned on the group key; at scale the
window partitioning reuses any upstream repartition on the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def latest_per_key(df: DataFrame, keys: list[str], order_by: list[Column | str]) -> DataFrame:
    """Keep the newest row per natural key — the reference's
    ``sorted(glob)[-1]`` newest-file-version pick
    (tcdb/pipeline/bdeck.py:105-108) and last-annual-id read
    (tcdb/etl/process_storms.py:222-229), as a classic latest-record
    dedup window. String entries sort descending (newest first); pass
    Column objects for custom direction. Include tiebreak columns: a
    nondeterministic tie makes the result unstable under retries.
    """
    cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    w = W.partitionBy(*keys).orderBy(*cols)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def topk_per_group(df: DataFrame, keys: list[str], order_by: list[Column], k: int) -> DataFrame:
    """Top-k rows per group by explicit ordering (reference k=1 argmin/argmax:
    nearest storm tcdb/etl/process_storms.py:43-56, longest track
    tcdb/etl/syntracks.py:366-371)."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("rank_in_group", F.row_number().over(w)).where(
        F.col("rank_in_group") <= k
    )


def first_last_per_group(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """First and last value of each ``value_cols`` per group ordered by
    ``order_col`` — the reference's ``values[0]`` / ``values[-1]`` per-group
    picks (first lat/lon, last storm name; tcdb/etl/atcf.py:310-325,364-367).

    Implemented with ``min_by``/``max_by`` over a deterministic composite
    ordering (order_col, tiebreak) — one aggregation, no window, map-side
    partial aggregation at scale.
    """
    ord_struct = F.struct(F.col(order_col), *( [F.col(tiebreak)] if tiebreak else [] ))
    aggs = []
    for c in value_cols:
        aggs.append(F.min_by(F.col(c), ord_struct).alias(f"first_{c}"))
        aggs.append(F.max_by(F.col(c), ord_struct).alias(f"last_{c}"))
    return df.groupBy(*keys).agg(*aggs)
