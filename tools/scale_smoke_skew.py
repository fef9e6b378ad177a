"""Planted-hot-key scale smoke for the fact-fact asof/interval join
family (VERDICT r5 #5): at 100 TB a hot entity key makes one reducer
the job.  Three measurements:

1. `asof_join` with a planted megahot key — the window partitions by
   the raw key, so ONE task sorts the hot key's full history (AQE
   cannot split a window partition).
2. `asof_join_bucketed` on the same data — the hot key's timeline
   splits into per-bucket partitions; results identical (pinned in
   tests/test_asof_bucketed.py), wall rescued.
3. `interval_join` with the same hot key under AQE — its equi-join on
   (key, time-bucket) IS splittable by AQE skew-join, and the planted
   key spreads over many buckets anyway; recorded for completeness.

Usage: python tools/scale_smoke_skew.py [n_left] [n_right]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from pyspark.sql import functions as F

    from tcdb_spark.operators.joins import asof_join, asof_join_bucketed, interval_join
    from tcdb_spark.session import get_spark

    spark = get_spark("skew-smoke")
    base = 1_600_000_000
    span = 60 * 86400  # 60 days

    # 90% of rows on key 1 (the megahot entity), rest uniform over 1000
    def skewed(n: int, ts_col: str):
        return (
            spark.range(n)
            .withColumn("__h", F.xxhash64("id"))
            .select(
                F.when(F.pmod("__h", F.lit(10)) < 9, F.lit(1))
                .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) + 2)
                .alias("k"),
                (F.lit(base) + F.pmod(F.xxhash64("id", F.lit(13)), F.lit(span)))
                .cast("timestamp")
                .alias(ts_col),
                (F.pmod(F.xxhash64("id", F.lit(17)), F.lit(1000)) / 1000.0).alias(
                    f"{ts_col}_val"
                ),
            )
        )

    left = skewed(n_left, "lts").persist()
    right = skewed(n_right, "rts").withColumnRenamed("rts_val", "rval").persist()
    print(f"left={left.count()} right={right.count()} hot-key share ~90%", flush=True)

    def run(label, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"| {label} | {dt:.1f} s |", flush=True)
        return dt

    run(
        f"asof_join_bucketed (6h buckets), {n_left/1e6:.0f}M left x "
        f"{n_right/1e6:.1f}M right, 90% one key",
        asof_join_bucketed(
            left, right, ["k"], "lts", "rts", ["rval"], bucket_hours=6.0
        ),
    )
    run(
        "asof_join (window over raw key — one task owns the hot key)",
        asof_join(left, right, ["k"], "lts", "rts", ["rval"]),
    )
    # r7: the nearest-direction bucketed variant carries BOTH boundary
    # packs (backward + earliest-after) — measured so the new direction
    # surface has its own planted-skew evidence, not just the backward
    # rescue's
    run(
        "asof_join_bucketed direction=nearest (both boundary carries)",
        asof_join_bucketed(
            left, right, ["k"], "lts", "rts", ["rval"], bucket_hours=6.0,
            direction="nearest",
        ),
    )
    run(
        "asof_join direction=nearest (raw-key window, both frames)",
        asof_join(left, right, ["k"], "lts", "rts", ["rval"], direction="nearest"),
    )
    run(
        "interval_join +-1h band (equi-join on (key, bucket): AQE-splittable)",
        interval_join(
            left.sample(0.01, seed=1),
            right.sample(0.01, seed=2),
            ["k"],
            "lts",
            "rts",
            tolerance_hours=1.0,
        ),
    )


if __name__ == "__main__":
    main()
