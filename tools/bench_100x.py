"""100x-replication probe (VERDICT r7 #5): the five riskiest lanes at
an sf10-equivalent scale (~60M lineitem rows, ~600k documents).

BENCH_BIG stops at 10x and the 2x perf gate runs at sf0.1; the lanes
whose caps do the most work (df-caps, band widths, degree caps, bucket
pruning) have never been observed at a scale where a cap FAILING would
be visible.  This tool materializes a DETERMINISTIC 100x dataset by
replicating the sf0.1 parquet with per-copy key offsets (the bench_big
recipe, 10x more copies) and runs ONLY the five riskiest lanes:

- graph_common_neighbors  (deg_cap: wedge count must scale ~linearly)
- dedup_ngram_jaccard     (NGRAM_DF_CAP vs a 100x-duplicated corpus)
- winnow_fingerprint      (per-gram md5 in-scan + one distinct shuffle)
- join_asof_bucketed      (bucketed window under 100x state)
- sim_ann_ivfpq           (pruned ADC config, 100x vector table)

Replication keeps each copy's KEY SPACE disjoint (offsets) but the
document/embedding PAYLOADS identical — deliberately: a 100x-duplicated
corpus is the boilerplate-heavy adversary web-scale dedup actually
faces, so the near-dup lanes are probed at their worst case, not their
average case.  Consequences (recorded in the output): every shingle's
document frequency multiplies by the copy count, so a CONSTANT df-cap
(NGRAM_DF_CAP=50) drops the entire index at 100x and the lane returns
zero pairs — the cap must be configured relative to corpus size /
duplication rate at this scale (OPERATIONS.md "Caps at scale").

Each lane runs ONCE, timed via ``count()`` (which also records the
output row count).  bench.py's JIT-settling discipline deliberately
does NOT apply here: at 100x every lane is minutes of data work, so
tiered-compilation noise is lost in the signal, and a settle pass would
double a multi-hour probe for nothing.  The wedge-candidate count is
recorded alongside so cap behavior is attributable (count is a property
of the DATA, wall time of the PLAN).

Usage: python tools/bench_100x.py [--rebuild] [round_tag]
Appends one JSON line to BENCH_BIG.md tagged "100x".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BIG_DIR = "/tmp/tcdb_bench_sf10"
COPIES = 100

# Same offset bases as tools/bench_big.py: powers of 10 above the sf0.1
# max key, so copies never collide and key-arithmetic derivations
# (doc_id % 10 residues, +1_000_000 planting) are preserved.  With 100
# copies the largest offset is 99 * 1_000_000 — far under 2^31, so the
# graph lane's packed-bigint pair key stays applicable.
KEYED = {
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 100_000},
}

LANES = [
    "graph_common_neighbors",
    "dedup_ngram_jaccard",
    "winnow_fingerprint",
    "join_asof_bucketed",
    "sim_ann_ivfpq",
]


def build(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.session import get_spark

    spark = get_spark("bench-100x-build")
    os.makedirs(BIG_DIR, exist_ok=True)
    for t, offsets in KEYED.items():
        df = load_tables(spark, sf_dir, t)[t]
        dtypes = dict(df.dtypes)
        # one scan x a broadcast 100-row copy index — NOT a 100-branch
        # union (that plan is 100 scans and a 100-way union node)
        copies = F.broadcast(
            spark.range(COPIES).select(F.col("id").alias("__copy"))
        )
        out = df.crossJoin(copies)
        for col, base in offsets.items():
            # cast back: id + bigint would silently widen int columns
            # and change the table schema vs the original
            out = out.withColumn(
                col, (F.col(col) + F.col("__copy") * base).cast(dtypes[col])
            )
        out.drop("__copy").write.mode("overwrite").parquet(
            f"{BIG_DIR}/{t}.parquet"
        )
        print(f"{t}: x{COPIES} -> {BIG_DIR}", flush=True)
    spark.stop()


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    tags = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = tags[0] if tags else "r?"
    if rebuild and os.path.exists(BIG_DIR):
        shutil.rmtree(BIG_DIR)
    if not os.path.exists(f"{BIG_DIR}/lineitem.parquet"):
        build()

    from tcdb_spark.plans import QUERIES
    from tcdb_spark.plans.queries_sim import sim_ann_ivfpq_pruned
    from tcdb_spark.session import get_spark

    impls = dict(QUERIES)
    impls["sim_ann_ivfpq"] = sim_ann_ivfpq_pruned  # production config, as in bench.py

    # longer heartbeat: 2.67B-row shuffle stages under full CPU load
    # overrun the 10 s default and spam RpcTimeoutException warnings
    spark = get_spark(
        "bench-100x",
        extra_conf={
            "spark.executor.heartbeatInterval": "60s",
            "spark.network.timeout": "600s",
        },
    )
    timings: dict[str, dict] = {}
    for name in LANES:
        fn = impls[name]
        t0 = time.perf_counter()
        rows = fn(spark, BIG_DIR).count()
        timed = time.perf_counter() - t0
        timings[name] = {"sec": round(timed, 1), "out_rows": rows}
        print(f"{name}: {timed:.1f}s, {rows} rows", flush=True)
        spark.catalog.clearCache()

    from tcdb_spark.operators.graph import wedge_candidate_count
    from tcdb_spark.plans.queries_stats import _CN_DEG_CAP, copurchase_edges

    wedges = wedge_candidate_count(copurchase_edges(spark, BIG_DIR), deg_cap=_CN_DEG_CAP)
    wedges_small = wedge_candidate_count(
        copurchase_edges(spark, "/root/testdata/sf0.1"), deg_cap=_CN_DEG_CAP
    )
    spark.stop()

    rec = {
        "metric": "riskiest5_100x",
        "sf": "10-equivalent (100x replicated sf0.1)",
        "round": tag,
        "queries": timings,
        "graph_wedge_candidates": wedges,
        "graph_wedge_candidates_sf01": wedges_small,
        "wedge_scale_ratio": round(wedges / max(wedges_small, 1), 2),
    }
    print(json.dumps(rec))
    with open("/root/repo/BENCH_BIG.md", "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
