"""Scale smoke for the round-4 session-5 statistical lanes: KS drift
fan-out at 10^7-row / near-continuous-value scale, Poisson-bootstrap
expansion with map-side collapse, and the common-neighbor wedge join
under an adversarial hub.  Prints rows to paste into SCALE_SMOKE.md.

Usage: python tools/scale_smoke_r4s5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(f"{label}: {dt}s {out}", flush=True)
    return dt, out


def main():
    from tcdb_spark.session import get_spark
    from tcdb_spark.operators.graph import common_neighbor_links
    from tcdb_spark.plans.queries_stats import bootstrap_ci, cusum_by_series, ks_by_cohort

    spark = get_spark("scale-smoke-r4s5")

    # ---- KS drift: 25M rows, 8 cohorts, ~continuous values (every value
    # distinct up to hash collisions) — the worst case for the ECDF
    # frame, which cannot collapse duplicates.  The fan-out is
    # |cohorts| x distinct = 2e8 intermediate rows, all integer window
    # sums in per-cohort partitions.
    n = 25_000_000
    ev = spark.range(n).select(
        F.concat(F.lit("c"), (F.col("id") % 8).cast("string")).alias("g"),
        (F.pmod(F.xxhash64("id"), 1_000_000_000) / F.lit(1000.0)).alias("v"),
    )
    timed(
        "ks_drift 25M rows x 8 cohorts (continuous values)",
        lambda: ks_by_cohort(ev, "g", "v").count(),
    )

    # ---- Poisson bootstrap: 2M rows x 100 replicates = 2e8 expanded
    # (md5 per expanded row is the dominant cost) collapsing map-side to
    # 8 cohorts x 100 replicate partials per task.
    be = spark.range(2_000_000).select(
        F.concat(F.lit("c"), (F.col("id") % 8).cast("string")).alias("g"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), 10_000) / F.lit(100.0)).alias("v"),
    )
    timed(
        "bootstrap_ci 2M rows x 100 reps (2e8 hashed weights)",
        lambda: bootstrap_ci(be, "g", "rid", "v").count(),
    )

    # ---- CUSUM: 250k series x 100 points (25M rows) — per-series
    # windows parallelize across series; the lever for ONE giant series
    # is epoch sharding (OPERATIONS.md).
    ce = spark.range(25_000_000).select(
        F.concat(F.lit("s"), (F.col("id") % 250_000).cast("string")).alias("g"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), 10_000) / F.lit(100.0)).alias("v"),
    )
    timed(
        "cusum_changepoint 250k series x 100 pts",
        lambda: cusum_by_series(ce, "g", "ts", "rid", "v").count(),
    )

    # ---- Common-neighbor wedges under a hub: 500k-node random graph
    # (4 edges/node) plus a 100k-degree hub.  Uncapped, the hub middle
    # alone contributes C(100k, 2) ~ 5e9 wedge pairs; the deg cap drops
    # hub middles, bounding the join by the random graph's degrees.
    n_nodes = 500_000
    base = (
        spark.range(1, n_nodes)
        .select(
            F.col("id").alias("u"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(4)),
                    lambda j: F.pmod(
                        F.xxhash64(F.col("id"), j), F.greatest(F.col("id"), F.lit(1))
                    ),
                )
            ).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    hub_id = n_nodes + 1
    hub = spark.range(1, 100_001).select(
        F.col("id").alias("u"), F.lit(hub_id).alias("v")
    )
    edges = (
        base.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .unionAll(hub)
        .distinct()
    )
    n_edges = edges.count()
    timed(
        f"common_neighbor_links {n_edges} edges incl. 100k-degree hub (cap=64)",
        lambda: common_neighbor_links(edges, deg_cap=64, top_n=50).count(),
    )


if __name__ == "__main__":
    main()
