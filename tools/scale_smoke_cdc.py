"""Scale smoke: soft-CDC apply and histogram-quantile shapes at
10^7-row table / 10^5-row feed scale, plus the grouped-Arrow OLS lane
over 10^7 events.  Appends to SCALE_SMOKE.md.

Usage: python tools/scale_smoke_cdc.py [rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 2)
    results.append((label, dt))
    print(f"{label}: {dt}s", flush=True)


def main():
    from tcdb_spark.operators.merge import apply_cdc_soft, cdc_bootstrap
    from tcdb_spark.operators.sketch import hist_partials, hist_quantile
    from tcdb_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-smoke-cdc")
    results: list[tuple[str, float]] = []

    # ---- soft-CDC: 10^7-key table, 10^5-op out-of-order feed ----
    cur = cdc_bootstrap(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 1000).cast("string").alias("v")
        )
    )
    feed = spark.range(n // 100).select(
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("k"),
        (F.col("id") + 1).alias("seq"),
        F.when(F.col("id") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("nv"), F.col("id")).alias("v"),
    )
    timed(
        f"soft-CDC apply: {n//100} ops onto {n}-row table",
        apply_cdc_soft(cur, feed, ["k"]),
        results,
    )

    # ---- histogram quantiles over 10^7 values, 1000 groups ----
    vals = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(1000)).alias("g"),
        (F.xxhash64("id") % 10_000).alias("x"),
    )
    parts = hist_partials(vals, "x", ["g"], lo=-10_000.0, hi=10_000.0, n_bins=128)
    timed(
        f"hist quantiles p50/p99: {n} values / 1000 groups",
        hist_quantile(parts, ["g"], [0.5, 0.99], lo=-10_000.0, hi=10_000.0, n_bins=128),
        results,
    )

    # ---- grouped applyInArrow OLS: 10^7 events, 100k groups ----
    ev = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 31536000).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    import numpy as np
    import pyarrow as pa

    def fit(table: pa.Table) -> pa.Table:
        uid = table.column("user_id")[0].as_py()
        x = np.asarray(
            table.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        ) / (86400.0 * 1e6)
        y = table.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        xc, yc = x - x.mean(), y - y.mean()
        den = float((xc * xc).sum())
        slope = float((xc * yc).sum()) / den if den else None
        return pa.Table.from_pydict(
            {"user_id": pa.array([uid], pa.int64()), "slope": pa.array([slope])}
        )

    timed(
        f"applyInArrow OLS: {n} rows / 100k groups",
        ev.groupBy("user_id").applyInArrow(fit, "user_id long, slope double"),
        results,
    )
    timed(
        "builtin regr_slope twin (same data)",
        ev.groupBy("user_id").agg(
            F.expr("regr_slope(value, unix_micros(ts) / 86400.0e6)").alias("slope")
        ),
        results,
    )

    with open("/root/repo/SCALE_SMOKE.md", "a") as f:
        f.write("\n## CDC / sketch / Arrow-lane shapes (tools/scale_smoke_cdc.py)\n\n")
        f.write("| shape | wall | note |\n|---|---|---|\n")
        notes = {
            0: "one batch window + MERGE full-outer join; bucketed table side would be shuffle-free",
            1: "partials are SUM-mergeable (group,bin) rows; quantile walk touches 128k rows total",
            2: "per-group closed-form on Arrow buffers; one shuffle on the group key",
            3: "codegen partial-aggregated — the recommended plan the Arrow lane is pinned against",
        }
        for i, (label, dt) in enumerate(results):
            f.write(f"| {label} | {dt}s | {notes.get(i, '')} |\n")
    print("appended SCALE_SMOKE.md")


if __name__ == "__main__":
    main()
