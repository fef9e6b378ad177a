"""Re-identification risk audits — k-anonymity and l-diversity.

§2.12 extension (the reference's tables are public storm observations;
a training corpus with user-joined metadata is not): before a curated
table ships to training, the pipeline must MEASURE linkage risk — how
small do the quasi-identifier (QI) equivalence classes get — and then
enforce a floor by suppression or generalization.  k-anonymity
(Sweeney, IJUFKS 2002) asks that every QI tuple be shared by >= k rows;
l-diversity (Machanavajjhala et al., TKDD 2007) additionally asks that
each QI class carry >= l distinct sensitive values, closing the
homogeneity attack k-anonymity alone leaves open (a size-50 class whose
sensitive attribute is constant discloses it for all 50).

Scale shape — the audits are aggregation-only and the enforcement is
one bounded join:

- class sizes are ONE hash aggregate on the QI columns (map-side
  partials make the skew-safe);
- the generalization LADDER (drop the finest QI column per rung) is a
  single ``rollup``: Spark expands it into one Expand + one aggregate,
  so the 100 TB fact is scanned ONCE for every rung of the report, not
  once per rung;
- suppression semi-joins rows against the keys of the classes that
  cleared the floor — after aggregation that key list is orders of
  magnitude smaller than the fact and usually broadcastable.

NULL discipline: a NULL QI value is a real equivalence class (groupBy
keeps it), so the suppression join must be null-safe (``<=>`` here,
``IS NOT DISTINCT FROM`` in the DuckDB oracles); inside the rollup the
``grouping()`` bits — not NULL-ness — decide which rung a row belongs
to, the classic subtotal-vs-genuine-NULL trap.  ``count(DISTINCT
sensitive)`` ignores NULL sensitive values in both engines, so an
all-NULL class audits as l = 0 and lands below any floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def qi_group_sizes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Equivalence-class sizes: one aggregate to ``(qi..., k)`` where k
    is the number of rows sharing that QI tuple (NULL is a value)."""
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("k"))


def k_anonymity_ladder(
    df: DataFrame, ladder: list[str], *, k_min: int
) -> DataFrame:
    """Per-rung k-anonymity report over a generalization ladder.

    ``ladder`` lists QI columns coarsest-first; ``rollup`` drops them
    from the RIGHT, so rung 0 is the full tuple and each next rung
    generalizes away the finest remaining column (rung ``len(ladder)``
    is the fully-suppressed table — one class of everything).  Emits
    one row per rung: class count, row count, classes and rows below
    the ``k_min`` floor, and the smallest class — everything a release
    decision needs, in one scan of the fact.
    """
    level: Column = sum(
        (F.grouping(c).cast("int") for c in ladder), F.lit(0)
    ).alias("level")
    sizes = df.rollup(*ladder).agg(
        level, F.count(F.lit(1)).alias("k")
    )
    below = F.col("k") < k_min
    return sizes.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.sum(below.cast("long")).alias("groups_below_k"),
        F.sum(F.when(below, F.col("k")).otherwise(F.lit(0))).alias("rows_below_k"),
        F.min("k").alias("min_k"),
    )


def l_diversity_classes(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Per-class ``(qi..., k, l)``: class size and the number of
    DISTINCT non-NULL sensitive values it carries.  Distinct-l is the
    strictest cheap variant; entropy-l needs the same single aggregate
    plus a log-sum and can reuse this frame."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(sensitive_col).alias("l"),
    )


def l_diversity_summary(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, *, l_min: int
) -> DataFrame:
    """One-row release gate for distinct-l diversity: how many classes
    (and rows) sit below the ``l_min`` floor, and the worst class's l.
    A class below the floor is vulnerable to the homogeneity attack
    even when its k is large."""
    cl = l_diversity_classes(df, qi_cols, sensitive_col)
    below = F.col("l") < l_min
    return cl.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(below.cast("long")).alias("groups_below_l"),
        F.sum(F.when(below, F.col("k")).otherwise(F.lit(0))).alias("rows_below_l"),
        F.min("l").alias("min_l"),
    )


def suppress_below_k(df: DataFrame, qi_cols: list[str], *, k_min: int) -> DataFrame:
    """Suppression enforcement: drop every row whose QI class has fewer
    than ``k_min`` members; the survivors satisfy k-anonymity at
    ``k_min`` by construction (removing rows never shrinks a surviving
    class).  Null-safe equi-join so NULL QI classes are suppressed or
    kept as classes, never silently dropped by join semantics.  The
    keep-list is post-aggregation (one row per surviving class) —
    broadcast it when it fits; at worst this is one shuffle on the QI
    key the audit already shuffled on."""
    keep = (
        qi_group_sizes(df, qi_cols)
        .where(F.col("k") >= k_min)
        .drop("k")
        .alias("__priv_keep")
    )
    left = df.alias("__priv_fact")
    # Explicit aliases: keep derives from df, so unqualified column
    # references resolve to the SAME attribute on both join sides
    # (Spark's trivially-true-predicate trap on self-referencing joins).
    cond = None
    for c in qi_cols:
        clause = F.col(f"__priv_fact.{c}").eqNullSafe(F.col(f"__priv_keep.{c}"))
        cond = clause if cond is None else cond & clause
    return left.join(keep, cond, "leftsemi")
