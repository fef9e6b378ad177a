"""Scale smoke for the round-4 session-4 operators: degree-oriented
triangle counting under an adversarial hub, positional phrase search at
10^7 tokens, and the sliding-distinct sketch-vs-exact crossover as the
window widens.  Prints rows to paste into SCALE_SMOKE.md.

Usage: python tools/scale_smoke_r4s4.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(f"{label}: {dt}s {out}", flush=True)
    return dt, out


def main():
    from tcdb_spark.session import get_spark
    from tcdb_spark.operators.graph import triangle_counts
    from tcdb_spark.plans.queries_ranking import phrase_match

    spark = get_spark("scale-smoke-r4s4")

    # ---- triangles: 2M-node random graph (4 edges/node) + a 1M-degree
    # hub.  A naive neighbor self-join enumerates deg(hub)^2/2 = 5e11
    # wedges at the hub alone; degree orientation points every hub edge
    # INTO the hub, so the hub generates ZERO wedges and the join stays
    # bounded by the small out-degrees.
    n_nodes, m = 2_000_000, 4
    base = spark.range(1, n_nodes).select(
        F.col("id").alias("src"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(m)),
                lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.greatest(F.col("id"), F.lit(1))),
            )
        ).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    hub = spark.range(1, 1_000_001).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    edges = base.union(hub)
    n_edges = edges.distinct().count()

    def run_tri():
        tri = triangle_counts(edges)
        total = tri.agg(F.sum("tri_cnt")).first()[0]
        return f"edges={n_edges} triangle-memberships={total}"

    timed(f"triangle_counts {n_edges} edges incl. 1M-degree hub", run_tri)

    # wedge-bound evidence: enumerated wedges = sum C(outdeg, 2) under
    # orientation vs the naive sum C(deg, 2)
    e = edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).where(F.col("u") != F.col("v")).distinct().persist()
    deg = e.select(F.explode(F.array("u", "v")).alias("x")).groupBy("x").count()
    naive = deg.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).first()[0]
    ew = (
        e.join(deg.select(F.col("x").alias("u"), F.col("count").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("count").alias("dv")), "v")
    )
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    outdeg = ew.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("x")
    ).groupBy("x").count()
    oriented = outdeg.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).first()[0]
    print(f"wedges: naive sum C(deg,2) = {naive:.3e}, oriented sum C(outdeg,2) = {oriented:.3e}", flush=True)

    # ---- phrase search at ~1.3e7 tokens: replicate the sf0.1 docs 20x
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep"))
        .select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text")
        .persist()
    )
    n_docs = big.count()
    n_tokens = big.select(
        F.sum(F.size(F.split(F.lower("text"), "[^a-z0-9]+")))
    ).first()[0]

    def run_phrase():
        out = phrase_match(big, ["table hash", "customer join", "slow hash batch"])
        return f"docs={n_docs} tokens~{n_tokens} matches={out.count()}"

    timed(f"phrase_match 3 phrases over {n_tokens} tokens", run_phrase)

    # ---- sliding distinct: 1M users x 60 days, ~16% active
    pairs = (
        spark.range(60_000_000)
        .select(
            (F.col("id") % 1_000_000).alias("user_id"),
            (F.col("id") / 1_000_000).cast("bigint").alias("d"),
        )
        .where(F.pmod(F.xxhash64("user_id", "d"), F.lit(100)) < 16)
        .persist()
    )
    n_pairs = pairs.count()
    daily = pairs.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk")).persist()
    daily.count()

    for wdays in (7, 28):
        win = W.orderBy("d").rangeBetween(-(wdays - 1), 0)

        def run_sketch():
            est = daily.select(
                "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(win)).alias("e")
            )
            return f"days={est.count()}"

        timed(f"sliding distinct SKETCH w={wdays} over {n_pairs} pairs", run_sketch)

        def run_exact():
            cov = pairs.select(
                "user_id",
                F.explode(F.sequence(F.col("d"), F.col("d") + wdays - 1)).alias("cd"),
            )
            days = pairs.select("d").distinct()
            ex = cov.join(days, cov.cd == days.d).groupBy("d").agg(
                F.count_distinct("user_id").alias("x")
            )
            return f"days={ex.count()}"

        timed(f"sliding distinct EXACT  w={wdays} over {n_pairs} pairs", run_exact)

    spark.stop()


if __name__ == "__main__":
    main()
