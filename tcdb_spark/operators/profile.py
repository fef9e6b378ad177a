"""One-pass table profiling: per-column counts, null counts, exact
distinct cardinality, and typed min/max — the stats pass every ingest
pipeline runs before trusting a new drop (and the input ANALYZE-style
CBO statistics are built from).

Design for 100 TB: ALL columns profile in ONE scan. The per-column
aggregates land in a single wide agg row (Spark plans the multiple
COUNT(DISTINCT)s as one Expand over the scan — m small expanded rows
per input row, still one pass over the table bytes, partial-aggregated
map-side), which is then exploded into the long per-column report.
Never one query per column: at 100 TB that multiplies table reads by
column count. For wide tables where exact distinct counts aren't worth
the Expand multiplier, swap count_distinct for approx_count_distinct
(HLL++, one pass, no Expand) — the report shape is unchanged.

Numeric min/max report as doubles, string as strings, timestamps as
ISO-8601 strings, so the report schema is stable across any profiled
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def _col_aggs(name: str, dtype: str) -> list[Column]:
    base = dtype.split("(")[0]
    is_num = base in _NUMERIC
    is_ts = base in ("timestamp", "timestamp_ntz", "date")
    c = F.col(name)
    min_num = F.min(c).cast("double") if is_num else F.lit(None).cast("double")
    max_num = F.max(c).cast("double") if is_num else F.lit(None).cast("double")
    if is_ts:
        min_str = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
        max_str = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
    elif is_num:
        min_str = F.lit(None).cast("string")
        max_str = F.lit(None).cast("string")
    else:
        min_str = F.min(c).cast("string")
        max_str = F.max(c).cast("string")
    return [
        F.count(c).alias(f"__nn_{name}"),
        F.countDistinct(c).alias(f"__nd_{name}"),
        min_num.alias(f"__minn_{name}"),
        max_num.alias(f"__maxn_{name}"),
        min_str.alias(f"__mins_{name}"),
        max_str.alias(f"__maxs_{name}"),
    ]


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one scan.

    Returns one row per column:
    (col_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str) — the *_num pair is NULL for non-numeric columns,
    the *_str pair NULL for numeric ones (ISO-8601 for timestamps).
    ``n_distinct`` counts non-null distinct values, matching
    COUNT(DISTINCT col) semantics in every SQL engine.
    """
    dtypes = dict(df.dtypes)
    cols = columns if columns is not None else list(dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.extend(_col_aggs(c, dtypes[c]))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__minn_{c}").alias("min_num"),
            F.col(f"__maxn_{c}").alias("max_num"),
            F.col(f"__mins_{c}").alias("min_str"),
            F.col(f"__maxs_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
