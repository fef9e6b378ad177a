"""Scale smoke for the round-8 session-3 families: privacy audits,
compression/NFC Arrow stages, capped preference expansion, fast
winnowing twin.

Measurements (local[32], printed as markdown rows for SCALE_SMOKE.md):

1. k-anonymity ladder + suppression over ~5M rows with a PLANTED
   megagroup (40% of rows share one QI tuple) — the audit is a pair of
   hash aggregates and the suppression a post-aggregation semi-join,
   so the hot class must cost nothing beyond its row count.
2. ``compression_signals`` + ``unicode_scrub`` over ~500k replicated
   documents — rows/s and text MB/s for the two Arrow stages (the
   per-core zlib/NFC rate is what cluster sizing starts from).
3. ``preference_pairs_topk`` at ~2M candidates over 10k groups with a
   PLANTED megaprompt (500k candidates in ONE group) — output pairs
   from that group must be exactly C(k,2), and wall time must not be
   dominated by it (the cap is the point).
4. ``winnow_frame_fast`` vs the md5 ``winnow_frame`` at sf0.1 x 4
   replication — interleaved best-of-2 each, the measured speedup the
   OPERATIONS.md guidance quotes.

Usage: python tools/scale_smoke_r8s3.py [n_rows_privacy] [n_pref]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def privacy_smoke(spark, n_rows: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.operators.privacy import k_anonymity_ladder, suppress_below_k

    # 40% of rows in one planted QI megaclass, the rest spread thin
    base = spark.range(n_rows).select(
        F.when(F.col("id") % 5 < 2, F.lit(0)).otherwise(
            (F.xxhash64("id") % 50000)
        ).alias("qa"),
        (F.xxhash64("id", F.lit(1)) % 20).alias("qb"),
        (F.xxhash64("id", F.lit(2)) % 11).alias("qc"),
    )
    t = time.time()
    ladder = k_anonymity_ladder(base, ["qa", "qb", "qc"], k_min=5).collect()
    t_audit = time.time() - t
    t = time.time()
    n_kept = suppress_below_k(base, ["qa", "qb", "qc"], k_min=5).count()
    t_supp = time.time() - t
    lvl0 = next(r for r in ladder if r["level"] == 0)
    print(
        f"| privacy k-anon ladder | {n_rows:,} rows, megaclass 40% | "
        f"audit {t_audit:.1f} s, suppress {t_supp:.1f} s | "
        f"lvl0 groups {lvl0['n_groups']:,}, kept {n_kept:,} |"
    )


def arrow_text_smoke(spark, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.plans.queries_text import compression_signals, unicode_scrub

    d = load_tables(spark, SF_DIR, "documents")["documents"].where(
        F.length(F.trim("text")) > 0
    )
    base = d.count()
    reps = max(1, n_docs // base)
    docs = d.select(
        "text", F.explode(F.sequence(F.lit(1), F.lit(reps))).alias("rep")
    ).select((F.col("rep") * 10_000_000 + F.monotonically_increasing_id()).alias("doc_id"), "text")
    docs = docs.repartition(64).persist()
    n = docs.count()
    mb = docs.agg(F.sum(F.length("text"))).collect()[0][0] / 1e6
    for name, fn in [("compression_signals", compression_signals), ("unicode_scrub", unicode_scrub)]:
        t = time.time()
        fn(docs).write.mode("overwrite").format("noop").save()
        dt = time.time() - t
        print(
            f"| {name} | {n:,} docs, {mb:.0f} MB text | {dt:.1f} s | "
            f"{n / dt:,.0f} rows/s, {mb / dt:.0f} MB/s |"
        )
    docs.unpersist()


def pref_smoke(spark, n_cand: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.queries_stats import preference_pairs_topk

    # ~25% of candidates land in ONE megaprompt, rest uniform over 10k
    scored = spark.range(n_cand).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % 10000)
        .alias("g"),
        F.col("id").alias("cid"),
        (F.xxhash64("id", F.lit(7)) % 1000000).alias("s"),
    )
    t = time.time()
    pairs = preference_pairs_topk(scored, "g", "cid", "s", k=4).persist()
    n_pairs = pairs.count()
    dt = time.time() - t
    mega = pairs.where(F.col("g") == 0).count()
    pairs.unpersist()
    assert mega <= 6, f"megaprompt emitted {mega} pairs (cap C(4,2)=6)"
    print(
        f"| preference_pairs_topk | {n_cand:,} cands, megaprompt 25% | "
        f"{dt:.1f} s | {n_pairs:,} pairs, megaprompt {mega} (cap 6) |"
    )


def winnow_smoke(spark, reps: int = 4) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.catalog import load_tables
    from tcdb_spark.plans.queries_text import winnow_frame, winnow_frame_fast

    d = load_tables(spark, SF_DIR, "documents")["documents"]
    docs = d.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(1), F.lit(reps))).alias("rep")
    ).select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text")
    docs = docs.repartition(64).persist()
    docs.count()
    best = {"md5": 1e9, "xxh": 1e9}
    for _ in range(2):
        for name, fn in [("md5", winnow_frame), ("xxh", winnow_frame_fast)]:
            t = time.time()
            fn(docs).write.mode("overwrite").format("noop").save()
            best[name] = min(best[name], time.time() - t)
    docs.unpersist()
    print(
        f"| winnow md5 vs xxhash64 | sf0.1 x {reps} | "
        f"md5 {best['md5']:.1f} s, xxh {best['xxh']:.1f} s | "
        f"{(best['md5'] / best['xxh'] - 1) * 100:.0f}% faster |"
    )


def main() -> None:
    from tcdb_spark.session import get_spark

    n_priv = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_pref = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("scale-smoke-r8s3", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    privacy_smoke(spark, n_priv)
    arrow_text_smoke(spark, 500_000)
    pref_smoke(spark, n_pref)
    winnow_smoke(spark)


if __name__ == "__main__":
    main()
