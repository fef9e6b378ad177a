"""Validation / constraint operators (SURVEY.md §2.9).

The reference validates per-value at object construction
(tcdb/validation.py:6-122) with two modes — raise, or coerce to
null/default. Set-based equivalents: strict mode counts violations in one
aggregate and fails the job; lenient mode rewrites columns with
``when(valid, c).otherwise(default)``. Both are single-pass, no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RangeRule:
    """Validity rule for one column: closed interval plus optional extra
    allowed values and a coercion default (None -> null)."""

    col: str
    lo: float | None = None
    hi: float | None = None
    also_allowed: tuple[float, ...] = ()
    default: float | None = None

    def valid(self) -> Column:
        c = F.col(self.col)
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (c >= self.lo)
        if self.hi is not None:
            cond = cond & (c <= self.hi)
        for v in self.also_allowed:
            cond = cond | (c == v)
        return c.isNull() | cond


# Reference ranges (tcdb/validation.py:6-88). Pressure: [850,1050] or 0,
# None -> 1000 default; velocity [0,250]; lat [-90,90]; lon [-180,180];
# distance >= 0; direction [0,360]; step >= 0.
PRESSURE = RangeRule("mslp_mb", 850, 1050, also_allowed=(0,), default=1000)
VELOCITY = RangeRule("intensity_kts", 0, 250)
LATITUDE = RangeRule("latitude", -90, 90)
LONGITUDE = RangeRule("longitude", -180, 180)
DIRECTION = RangeRule("direction", 0, 360)


def check_range_coerce(df: DataFrame, rules: list[RangeRule]) -> DataFrame:
    """Lenient mode: out-of-range -> default (or null); reference's
    non-raising branch. NULL pressure becomes the 1000 mb default exactly
    like validate_pressure(None)."""
    for r in rules:
        if r.col not in df.columns:
            continue
        repl = F.lit(r.default).cast(dict(df.dtypes)[r.col]) if r.default is not None else F.lit(None)
        c = F.when(r.valid(), F.col(r.col)).otherwise(repl)
        if r.default is not None:
            c = F.coalesce(c, F.lit(r.default))
        df = df.withColumn(r.col, c)
    return df


def check_range_strict(df: DataFrame, rules: list[RangeRule]) -> dict[str, int]:
    """Strict mode: one aggregate pass counting violations per rule;
    caller raises when any count > 0 (reference raise_on_fail=True)."""
    aggs = [
        F.sum(F.when(~r.valid(), 1).otherwise(0)).alias(r.col)
        for r in rules
        if r.col in df.columns
    ]
    if not aggs:
        return {}
    row = df.agg(*aggs).first().asDict()
    return {k: int(v or 0) for k, v in row.items()}


def assert_valid(df: DataFrame, rules: list[RangeRule]) -> DataFrame:
    counts = check_range_strict(df, rules)
    bad = {k: v for k, v in counts.items() if v > 0}
    if bad:
        raise ValueError(f"range violations: {bad}")
    return df


def observed_violations(df: DataFrame, rules: list[RangeRule], name: str = "validation"):
    """One-pass validation metrics piggybacked on the consumer's own
    action via ``DataFrame.observe`` — at 100 TB this costs zero extra
    scans, unlike check_range_strict's dedicated aggregate.

    Returns (df, observation); read ``observation.get`` AFTER an action on
    the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [
        F.sum(F.when(~r.valid(), 1).otherwise(0)).alias(f"bad_{r.col}")
        for r in rules
        if r.col in df.columns
    ]
    return df.observe(obs, *metrics), obs


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Natural-key uniqueness violations (the reference's unique indexes,
    db/init_db_base.sql:137-145): returns the offending key groups
    (empty == constraint holds)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)


def check_fk_orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """FK integrity (db/init_db_base.sql:124-135): child rows whose fk has
    no parent — the quarantine/skip set (tcdb/etl/process_obs.py:62-65)."""
    p = parent.select(F.col(pk).alias(fk)).dropDuplicates([fk])
    return child.join(p, on=fk, how="left_anti")
