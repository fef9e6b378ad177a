"""Multi-dimensional data clustering (Z-order) for scan pruning.

At 100 TB the fastest byte is the one never read: parquet stores
min/max statistics per row group, and the reader skips any group whose
range cannot satisfy the pushed filter. A table sorted on ONE column
skips beautifully on that column and not at all on others; Z-ORDER
(Morton-curve) clustering interleaves the bits of several columns so
row groups stay tight in ALL of them at once — the same trick behind
Delta OPTIMIZE ZORDER BY and Iceberg's sort-order zorder.

Everything here is pure column expressions (shift/mask/or — whole-stage
codegen): rows are scaled onto an integer grid per column using global
min/max (one tiny aggregate), bits are interleaved into a Morton key,
and the write range-partitions + sorts by that key. No UDFs, no driver
loops; the only shuffle is the range partitioning any clustered write
needs.

Reference scope note: the reference stores MySQL tables and has no
layout tuning; this is engine-side scale surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_grid(col: str, mn: Column, mx: Column, bits: int) -> Column:
    """Map a value linearly onto [0, 2^bits) using global min/max.
    Constant columns (mx == mn) map to 0."""
    span = mx - mn
    unit = (F.col(col).cast("double") - mn) / F.when(span > 0, span).otherwise(F.lit(1.0))
    cells = F.lit((1 << bits) - 1)
    return F.least(F.greatest(F.round(unit * cells, 0).cast("bigint"), F.lit(0)), cells)


def morton_key(grid_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each grid-scaled column into one
    Morton key: key bit (i*k + j) takes bit i of column j. 2 cols ×
    16 bits = 32 shift/or terms — a flat codegen expression."""
    k = len(grid_cols)
    terms = []
    for j, c in enumerate(grid_cols):
        for i in range(bits):
            src = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, i * k + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """The Z-order key for ``cols``, grid-scaled from the frame's own
    global min/max (computed once, folded in as literals — partition
    pruning of the stats query is irrelevant at 2 rows per column)."""
    if not (1 <= len(cols) * bits <= 62):
        raise ValueError("total interleaved bits must fit a signed 64-bit key")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    grids = [
        _scale_to_grid(c, F.lit(stats[f"mn_{c}"]), F.lit(stats[f"mx_{c}"]), bits)
        for c in cols
    ]
    return morton_key(grids, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    block_bytes: int | None = None,
) -> None:
    """Write ``df`` Z-order clustered on ``cols``: range-partition by
    the Morton key (equal-sized files along the curve), sort within
    partitions, drop the key. ``block_bytes`` caps parquet row-group
    size — smaller groups = finer skipping granularity (default: leave
    Spark's 128 MB grouping alone; tests shrink it to get many groups
    from small data)."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits))
    w = (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if block_bytes is not None:
        w = w.option("parquet.block.size", str(block_bytes))
    w.parquet(path)


def row_groups_matching(path: str, predicates: dict[str, tuple]) -> tuple[int, int]:
    """Data-skipping measurement: (groups that a min/max-pruning reader
    must read, total groups) for conjunctive range predicates
    ``{col: (lo, hi)}`` — the same statistics test parquet readers run.
    Used by tests/bench to show clustering actually prunes."""
    import pyarrow.parquet as pq

    must_read = total = 0
    dataset = pq.ParquetDataset(path)
    for piece in dataset.fragments:
        md = piece.metadata
        schema_names = md.schema.names
        for g in range(md.num_row_groups):
            total += 1
            rg = md.row_group(g)
            hit = True
            for col, (lo, hi) in predicates.items():
                idx = schema_names.index(col)
                st = rg.column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            must_read += int(hit)
    return must_read, total
