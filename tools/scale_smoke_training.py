"""Scale smoke for the training-assembly + graph block: PageRank,
negative-pair sampling, deterministic training-order shuffle,
conversation assembly, and the funnel — at 10^7-10^8 synthetic rows on
local[32], no disk.  Appends a section to SCALE_SMOKE.md.

Usage: python tools/scale_smoke_training.py [rows]
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
    from tcdb_spark.operators.graph import pagerank
    from tcdb_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("scale-smoke-training")
    results: list[tuple[str, float]] = []

    # ---- PageRank: 16M-edge bipartite graph (1M left, 100k right) ----
    edges = (
        spark.range(16_000_000)
        .select(
            F.concat(F.lit("c"), F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("src"),
            F.concat(F.lit("s"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))).alias("dst"),
        )
    )
    t0 = time.perf_counter()
    pr = pagerank(edges, iters=3)
    timed("pagerank 3 iters, 16M edges / 1.1M nodes", pr, results)
    print(f"  (incl. symmetrize+degree: {round(time.perf_counter()-t0,2)}s total)")

    # ---- negative-pair sampling: 10^8 anchors, K=4, one equi-join ----
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"), F.pmod(F.col("id"), F.lit(1000)).alias("label")
    )
    k = 4
    pairs = (
        emb.select(
            "vec_id",
            "label",
            F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
        )
        .withColumn("neg_id", (F.col("vec_id") + F.col("j") * F.lit(97)) % F.lit(n))
        .join(
            emb.select(F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")),
            "neg_id",
        )
        .where(F.col("neg_label") != F.col("label"))
    )
    timed(f"negative pairs K=4 over {n} anchors", pairs.groupBy().count(), results)

    # ---- training-order shuffle: 10^8 docs, 4096 shards ----
    from pyspark.sql.window import Window as W

    shards = 4096
    hx = F.md5(F.concat(F.lit("ep1:"), F.col("id").cast("string")).cast("binary"))
    sh = spark.range(n).select(
        "id",
        hx.alias("hx"),
        (
            (F.ascii(F.substring(hx, 1, 1)) * 256 + F.ascii(F.substring(hx, 2, 1)))
            % shards
        ).alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy("hx", "id")
    timed(
        f"training-order shuffle {n} docs / {shards} shards",
        sh.select("id", "shard_id", F.row_number().over(w).alias("r")),
        results,
    )

    # ---- conversation assembly: 2*10^7 events over 1M dialogues ----
    ne = min(n, 20_000_000)
    ev = spark.range(ne).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 31536000).alias("ts"),
        F.concat(F.lit("e"), F.pmod(F.col("id"), F.lit(5))).alias("event_type"),
    )
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    conv = ev.groupBy("user_id").agg(
        F.count("*").alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    seq, lambda s: F.concat_ws(":", s["event_type"], s["event_id"].cast("string"))
                ),
                "|",
            )
        ).alias("fp"),
    )
    timed(f"conversation assembly {ne} events / 1M dialogues", conv, results)

    # ---- funnel: three staged joins on the same key ----
    s = ev.where(F.col("event_type") == "e0").groupBy("user_id").agg(F.min("ts").alias("s_ts"))
    c = (
        ev.where(F.col("event_type") == "e1")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "e2")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.count("*").alias("x"))
    )
    timed(f"3-stage funnel over {ne} events", p.groupBy().count(), results)

    with open("/root/repo/SCALE_SMOKE.md", "a") as f:
        f.write("\n## Training-assembly + graph block (tools/scale_smoke_training.py)\n\n")
        f.write("| shape | wall | note |\n|---|---|---|\n")
        notes = {
            0: "1 shuffle/iteration; rank state O(nodes); lineage truncated per round",
            1: "ring partners -> ONE equi-join; the cross-join formulation would be 4*10^16 pairs",
            2: "hash-partitioned two-level shuffle; no global sort anywhere in the plan",
            3: "collect_list bounded by dialogue length; single user_id shuffle",
            4: "all three stages shuffle on the SAME key; stage frames shrink monotonically",
        }
        for i, (label, dt) in enumerate(results):
            f.write(f"| {label} | {dt}s | {notes.get(i, '')} |\n")
    print("appended SCALE_SMOKE.md")


if __name__ == "__main__":
    main()
