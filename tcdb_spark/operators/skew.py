"""Skew-handling aggregation (100 TB design note: hot grouping keys).

AQE's skew-join handling covers joins; for aggregations with pathological
key skew the classic fix is salting: explode each hot key into
``n_salts`` sub-keys, partially aggregate, then finish on the true key.
Results are identical to a plain groupBy — the property the oracle
checks — while the heavy shuffle spreads over n_salts× more partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: sum/count per key.

    ``salt_source`` must be a deterministic column (default: a hash of all
    input columns) — never rand(), which breaks retry determinism.
    """
    salt = (
        F.pmod(salt_source if salt_source is not None else F.xxhash64(*df.columns), F.lit(n_salts))
    ).alias("__salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(value_col).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("sum_value"),
        F.sum("__pcnt").alias("n"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's key into
    ``n_salts`` sub-keys (deterministic hash of the whole row) and
    REPLICATE every dim row once per salt, so a hot key's rows spread
    over ``n_salts`` shuffle partitions instead of hammering one task.

    This is the manual form of what AQE skew-join does by splitting
    oversized partitions post-shuffle; the manual form also covers the
    cases AQE cannot touch (aggregations upstream of the join, skew
    appearing only after filters). Cost: dim side grows ``n_salts``× —
    use for genuinely small-to-medium dims with a giant skewed fact.
    Results are identical to the plain join (the equivalence test and
    the ``salted_join_equivalence`` oracle check exactly that).

    Column contract mirrors ``join``: output = fact columns + dim
    columns minus the duplicate key.
    """
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts))
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = fact_salted.join(dim_replicated, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_minutes``. Classic
    lag + conditional cumsum over one window — a single shuffle on the
    key (batch twin of streaming ``session_window``). Pass ``tiebreak``
    when timestamps can collide within a key (ordering must be total)."""
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = W.partitionBy(*keys).orderBy(*order)
    gap_s = gap_minutes * 60.0
    new_sess = (
        F.col(ts_col).cast("double")
        - F.lag(F.col(ts_col).cast("double")).over(w)
        > gap_s
    )
    return df.withColumn(
        session_col,
        F.sum(F.when(F.coalesce(new_sess, F.lit(False)), 1).otherwise(0)).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ),
    )


def topn_per_key_two_phase(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    n: int,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Skew-safe top-N per key: the plain ``row_number() OVER
    (PARTITION BY key)`` serializes each key into ONE task, so a hot
    key (10% of a crawl behind one domain) becomes the straggler that
    dominates the stage.  Two phases fix it without changing the
    answer:

    1. salt the rows (deterministic hash, never rand()) and take the
       top-N within each (key, salt) slice — correct because the global
       top-N of a key is a subset of the union of its per-slice top-Ns
       (each winner is top-N in whatever slice it landed in);
    2. exact top-N over the pruned union — at most ``n_salts * n`` rows
       per key instead of the key's full row count.

    ``order_by`` must be a total order (add a unique tiebreak) so ranks
    are deterministic; equivalence to the one-phase window is the
    property the test checks.
    """
    from pyspark.sql.window import Window as W

    salt = F.pmod(
        salt_source if salt_source is not None else F.xxhash64(*df.columns),
        F.lit(n_salts),
    ).alias("__salt")
    w_local = W.partitionBy(*keys, "__salt").orderBy(*order_by)
    pruned = (
        df.select("*", salt)
        .withColumn("__rn", F.row_number().over(w_local))
        .where(F.col("__rn") <= n)
        .drop("__salt", "__rn")
    )
    w_global = W.partitionBy(*keys).orderBy(*order_by)
    return (
        pruned.withColumn("__rn", F.row_number().over(w_global))
        .where(F.col("__rn") <= n)
        .withColumnRenamed("__rn", "rank_in_key")
    )
