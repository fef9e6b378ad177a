"""Round-5 scale smoke: distributed Bradley-Terry at 10^5 items.

The driver MM solve (bt_ratings_from_wins) is guarded at 10k duel cells
— right for model leaderboards, impossible for per-document preference
data.  This smoke runs the join-aggregate MM twin
(bt_ratings_distributed) over a 100k-item tournament whose duel matrix
(≈400k directed cells) would blow the guard by 40x, and sanity-checks
the result against the construction:

- ring tournament: item i beats item (i+1) mod N twice and loses once,
  plus a "champion" item that beats 50 extra opponents — every item has
  wins, the champion must out-rate the ring average.
- ratings normalize to sum 1 (within float tolerance) and are finite.

Usage: python tools/scale_smoke_r5.py [n_items]
Appends a result line to stdout; wall time is the headline number.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pyspark.sql import functions as F

    from tcdb_spark.plans.queries_stats import bt_ratings_distributed
    from tcdb_spark.session import get_spark

    spark = get_spark("scale-smoke-r5")
    ids = spark.range(n).select(F.col("id").alias("i"))
    ring = ids.select(
        F.col("i").cast("string").alias("winner"),
        ((F.col("i") + 1) % n).cast("string").alias("loser"),
        F.lit(2).alias("n_wins"),
    )
    back = ids.select(
        ((F.col("i") + 1) % n).cast("string").alias("winner"),
        F.col("i").cast("string").alias("loser"),
        F.lit(1).alias("n_wins"),
    )
    champ = (
        spark.range(50)
        .select(
            F.lit("0").alias("winner"),
            (F.col("id") * 7 % n).cast("string").alias("loser"),
            F.lit(3).alias("n_wins"),
        )
        .where(F.col("loser") != "0")
    )
    wins = ring.unionByName(back).unionByName(champ)

    t0 = time.perf_counter()
    out = bt_ratings_distributed(wins, "item", iters=10)
    stats = out.agg(
        F.count("*").alias("k"),
        F.sum("rating").alias("tot"),
        F.max(F.when(F.col("item") == "0", F.col("rating"))).alias("champ"),
        F.avg("rating").alias("mean"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    assert stats["k"] == n, stats
    assert abs(stats["tot"] - 1.0) < 1e-3, stats
    assert stats["champ"] > stats["mean"], stats
    print(
        f"bt_distributed n_items={n} duel_cells~{2 * n + 50} "
        f"iters=10 wall={wall:.1f}s champ={stats['champ']:.2e} "
        f"mean={stats['mean']:.2e} PASS"
    )


if __name__ == "__main__":
    main()
