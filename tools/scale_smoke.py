"""Scale smoke: run the engine's core plan shapes at 10^8-row scale on
local[32] — no disk, data generated with spark.range — to demonstrate the
shapes hold far beyond the test scale factors. Writes SCALE_SMOKE.md.

Usage: python tools/scale_smoke.py [rows]
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
    from tcdb_spark.operators.skew import salted_sum_count
    from tcdb_spark.operators.windows import latest_per_key
    from tcdb_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("scale-smoke")
    results: list[tuple[str, float]] = []

    # 10^8-row fact with a heavily skewed key: 50% of rows share key 0
    fact = (
        spark.range(n)
        .withColumn(
            "key",
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000))),
        )
        .withColumn("v", (F.col("id") % 1000).cast("double"))
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 31536000))
    )
    dim = spark.range(1_000_000).withColumnRenamed("id", "key").withColumn(
        "label", F.concat(F.lit("k"), F.col("key"))
    )

    timed(f"scan+filter+agg {n} rows", fact.where(F.col("v") > 10).groupBy().agg(F.sum("v"), F.count(F.lit(1))), results)
    timed("plain groupBy on 50%-skewed key", fact.groupBy("key").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")), results)
    timed("salted two-phase agg, same key", salted_sum_count(fact, ["key"], "v", n_salts=64), results)
    timed(
        "broadcast join fact x 1M dim",
        fact.join(F.broadcast(dim), on="key").groupBy("label").agg(F.count(F.lit(1))).orderBy(F.desc("count(1)")).limit(10),
        results,
    )
    timed(
        "latest-per-key window over 10M keys",
        latest_per_key(
            fact.where(F.col("key") != 0).limit(20_000_000), ["key"], ["ts", "id"]
        ),
        results,
    )

    # contamination shape: n/10 docs x 16 shingle hashes, 10% eval split;
    # explode -> distinct train index -> shuffle join on shingle -> re-agg
    n_docs = n // 10
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda j: F.xxhash64((F.col("id") % (n_docs // 20)) * 31 + j),
        ).alias("sh"),
    )
    ex = docs.select("doc_id", F.explode("sh").alias("shingle"))
    train = (
        ex.where(F.col("doc_id") % 10 != 0)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ev = ex.where(F.col("doc_id") % 10 == 0)
    timed(
        f"contamination shingle join, {n_docs} docs x 16 shingles",
        ev.join(train, "shingle", "left").groupBy("doc_id").agg(F.count("__hit")),
        results,
    )

    # connected components over 20M edges (path components of 5 nodes,
    # diameter 4 -> ~5 label-propagation rounds, one shuffle each)
    from tcdb_spark.operators.graph import connected_components

    edges = (
        spark.range(20_000_000)
        .where(F.col("id") % 5 != 4)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    t0 = time.perf_counter()
    cc = connected_components(edges)
    n_clusters = cc.select("label").distinct().count()
    results.append(("connected components, 16M edges / 20M nodes", round(time.perf_counter() - t0, 2)))
    print(f"cc clusters: {n_clusters}", flush=True)

    # resample shape: window lead over 25M events / 250k keys + grid explode
    nev = n // 4
    ev2 = spark.range(nev).select(
        (F.col("id") / 100).cast("long").alias("key"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 100) * 3700).alias("ts"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("key").orderBy("ts")
    seg = (
        ev2.select(
            "key", "ts", "v",
            F.lead("ts").over(w).alias("ts2"),
            F.lead("v").over(w).alias("v2"),
        )
        .where(F.col("ts2").isNotNull())
        .withColumn("e1", F.unix_micros("ts"))
        .withColumn("e2", F.unix_micros("ts2"))
        .withColumn("i0", F.expr("(e1 + 3599999999) div 3600000000"))
        .withColumn("i1", F.expr("(e2 - 1) div 3600000000"))
        .where(F.col("i0") <= F.col("i1"))
    )
    pts = seg.select("key", "v", "v2", "e1", "e2", F.explode(F.sequence("i0", "i1")).alias("i"))
    timed(
        f"resample interp window+explode, {nev} events / {nev // 100} keys",
        pts.select(
            "key",
            F.timestamp_micros(F.col("i") * 3600000000).alias("grid_ts"),
            (
                F.col("v")
                + (F.col("v2") - F.col("v"))
                * ((F.col("i") * 3600000000 - F.col("e1")).cast("double") / (F.col("e2") - F.col("e1")).cast("double"))
            ).alias("val"),
        ),
        results,
    )

    # hot-key df-cap on the shingle index: the agg that bounds the
    # near-dup self-join (operators/textdedup.py) at corpus scale
    from tcdb_spark.operators.textdedup import drop_hot_keys

    timed(
        f"df-cap hot-key filter over {n_docs}x16 shingle index",
        drop_hot_keys(ex, "shingle", 1000),
        results,
    )

    # sequence packing: global running-sum window (single reducer by
    # design here; per-shard partitioned in production) over n/10 docs
    toks = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), (F.col("id") % 900 + 100).alias("n_tokens")
    )
    w2 = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_tokens").over(w2)
    timed(
        f"sequence packing cumsum over {n_docs} docs (single-shard worst case)",
        toks.select(
            "doc_id", F.floor((cum - F.col("n_tokens")) / 4096).alias("pack_id")
        ),
        results,
    )

    # PII regex scan: 3 patterns over n/10 synthetic strings - the
    # zero-shuffle embarrassingly-parallel shape
    texts = spark.range(n_docs).select(
        F.concat(
            F.lit("user"), F.col("id"), F.lit(" mail a"), F.col("id") % 997,
            F.lit("@example.com ip 10.0."), F.col("id") % 255, F.lit(".7 t"),
        ).alias("text")
    )
    timed(
        f"PII regex scan (3 patterns) over {n_docs} strings",
        texts.select(
            F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")).alias("a"),
            F.regexp_count(F.col("text"), F.lit(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")).alias("b"),
        ).groupBy().sum("a", "b"),
        results,
    )

    with open("/root/repo/SCALE_SMOKE.md", "w") as f:
        f.write("# SCALE SMOKE — core plan shapes at 10^8 rows (local[32])\n\n")
        f.write(f"`python tools/scale_smoke.py {n}` — generated in-memory with\n")
        f.write("`spark.range`, AQE + skew-join on, 32 shuffle partitions.\n\n")
        f.write("| plan shape | wall (s) |\n|---|---|\n")
        for label, dt in results:
            f.write(f"| {label} | {dt} |\n")
        f.write(
            "\nNotes: the 50%-hot-key aggregation survives because partial\n"
            "aggregation collapses the hot key map-side before the shuffle;\n"
            "the salted variant shows the two-phase fallback for algebraic\n"
            "aggs where partials can't collapse (e.g. exact distincts). The\n"
            "broadcast join never shuffles the fact table. The contamination\n"
            "join shuffles both sides on the shingle key (the canonical\n"
            "decontamination shape — neither side broadcastable at corpus\n"
            "scale). Connected components converges in O(diameter) rounds of\n"
            "one shuffle each with localCheckpoint lineage truncation. The\n"
            "resample shape is one window sort-shuffle, then pure per-row\n"
            "grid generation. The df-cap filter is the pay-once aggregation\n"
            "that bounds every near-dup self-join; the packing cumsum is\n"
            "deliberately the single-shard worst case (production partitions\n"
            "the window by shard); the PII scan is the zero-shuffle\n"
            "embarrassingly-parallel regex shape. Numbers are single-node\n"
            "wall-clock on a shared box and vary run to run; on a cluster the same\n"
            "plans scale out by partition count.\n"
            "\n"
            "Bucketed fact layout (`Warehouse.write_bucketed`, wired into the\n"
            "b-deck job via `bucket_obs=True`): MERGE against a table bucketed\n"
            "on storm_id executes with exactly ONE Exchange — the incoming\n"
            "batch — verified by plan assert in\n"
            "`tests/test_scale_ops.py::test_warehouse_bucketed_merge_colocated`,\n"
            "including after a catalog re-registration (fresh session) and for\n"
            "composite-key merges where the bucket key is a prefix of the join\n"
            "key (`requireAllClusterKeysForCoPartition=false`). At 100 TB this\n"
            "removes the dominant cost of every incremental upsert: the full\n"
            "table-side shuffle; `merge_scoped` further cuts the rewrite to\n"
            "O(touched buckets) bytes by hard-linking untouched bucket files\n"
            "into the new version.\n"
        )
    print("wrote SCALE_SMOKE.md")


if __name__ == "__main__":
    main()
