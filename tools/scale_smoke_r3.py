"""Scale smoke for the round-3 operators: truncated-EWMA window lags,
PSI drift binning/aggregation, and the candidate-bounded RRF fusion —
each at 10^7-10^8-row synthetic scale on local[32].  Appends to
SCALE_SMOKE.md.

Usage: python tools/scale_smoke_r3.py [rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 2)
    results.append((label, dt))
    print(f"{label}: {dt}s", flush=True)


def main():
    from tcdb_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    spark = get_spark("scale-smoke-r3")
    results: list[tuple[str, float]] = []

    # ---- EWMA: 2.5e7 events over 2.5e5 keys (100 rows/key) ----
    events = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % (n // 100)).alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") / (n // 100)).cast("long")).alias("ts"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    decay = [0.5 ** i for i in range(8)]
    lags = [F.lag("value", i).over(w) for i in range(8)]
    num, den = None, None
    for i in range(8):
        t = F.when(lags[i].isNotNull(), lags[i] * F.lit(decay[i])).otherwise(F.lit(0.0))
        d = F.when(lags[i].isNotNull(), F.lit(decay[i])).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    timed(
        f"truncated EWMA (8 lags) over {n} events / {n // 100} keys",
        events.select("event_id", (num / den).alias("ewma")),
        results,
    )

    # ---- PSI: bin + count 1e8 values into a (types x 16) count matrix ----
    big = 4 * n
    vals = spark.range(big).select(
        (F.col("id") % 7).alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 100.0).alias("value"),
    )
    rng = vals.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = vals.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 16)),
            F.lit(15),
        ).cast("int").alias("bin"),
    )
    counts = [
        F.sum(F.when(F.col("bin") == i, 1).otherwise(0)).alias(f"c{i}") for i in range(16)
    ]
    timed(
        f"PSI bin+count matrix over {big} values / 7 cohorts",
        binned.groupBy("event_type").agg(*counts),
        results,
    )

    # ---- RRF: two top-100 legs out of 1e7 scored candidates + fusion ----
    docs = spark.range(n // 2).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000_000)) / 1e7).alias("lex_score"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000_000)) / 1e7).alias("sem_score"),
    )
    lex = (
        docs.orderBy(F.col("lex_score").desc(), F.col("doc_id").asc()).limit(100)
        .withColumn("lex_rank", F.row_number().over(W.orderBy(F.col("lex_score").desc(), F.col("doc_id").asc())))
        .select("doc_id", "lex_rank")
    )
    sem = (
        docs.orderBy(F.col("sem_score").desc(), F.col("doc_id").asc()).limit(100)
        .withColumn("sem_rank", F.row_number().over(W.orderBy(F.col("sem_score").desc(), F.col("doc_id").asc())))
        .select("doc_id", "sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
    ).orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(20)
    timed(f"RRF fusion: two top-100 legs from {n // 2} candidates", fused, results)

    with open("/root/repo/SCALE_SMOKE.md", "a") as f:
        f.write("\n## Round-3 operator shapes (tools/scale_smoke_r3.py)\n\n")
        f.write("| shape | wall | note |\n|---|---|---|\n")
        notes = {
            0: "one per-key window sort-shuffle; all 8 lags share one window spec (single pass per sorted partition)",
            1: "integer bin counts partial-aggregate map-side; output is cohorts x 16 regardless of input rows",
            2: "each leg is TakeOrderedAndProject (k per partition -> driver merge, no full sort); fusion runs on 100-row frames",
        }
        for i, (label, dt) in enumerate(results):
            f.write(f"| {label} | {dt}s | {notes.get(i, '')} |\n")
    print("appended SCALE_SMOKE.md")


if __name__ == "__main__":
    main()
