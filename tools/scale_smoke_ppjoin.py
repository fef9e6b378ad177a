"""Scale smoke for the prefix-filtered set joins (PPJoin Jaccard +
asymmetric containment): synthetic shingle-array corpus generated with
spark.range (no disk), with a deliberately HOT shingle pool that would
blow up a full inverted-index self-join quadratically — the point of
the smoke is that the prefix filter keeps only rare shingles in the
index, so the candidate pair count tracks the PLANTED pairs, not the
hot-key square.

Corpus: N docs x 40 distinct shingles = 35 unique + 5 drawn from a
20-shingle hot pool (df = N/20 each). 0.5% of docs get a clone sharing
36/40 shingles (Jaccard 36/44 = 0.818 >= 0.7). A full inverted join
would generate >= 20 * (N*0.25/20)^2 hot pairs (~7.8e8 at N=500k); the
prefix index (rarest 13 of 40) contains only df<=2 shingles, so the
pair join stays linear in the planted clones.

Containment: 1% of odd (eval) docs are 20-shingle subsets of an even
(train) doc's 100 shingles — containment 1.0, Jaccard 0.2 (invisible
to the symmetric join at t=0.7, the asymmetric lane's reason to exist).

Usage: python tools/scale_smoke_ppjoin.py [n_docs]
Prints markdown rows for SCALE_SMOKE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from tcdb_spark.operators.textdedup import containment_pairs, prefix_jaccard_pairs
    from tcdb_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("scale-smoke-ppjoin")

    # --- PPJoin Jaccard self-join ----------------------------------------
    uniq = F.transform(
        F.sequence(F.lit(1), F.lit(35)),
        lambda j: F.concat(F.lit("u"), (F.col("id") % 200000000).cast("string"), F.lit("_"), j),
    )
    hot = F.transform(
        F.sequence(F.lit(1), F.lit(5)),
        lambda j: F.concat(F.lit("hot"), ((F.col("id") * 7 + j) % 20).cast("string")),
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat(uniq, hot).alias("shingles")
    )
    # clones: doc i (i % 200 == 0) cloned as doc i + n_docs with 36/40
    # shared shingles (keep 31 uniques + the 5 hots, add 4 fresh)
    clone_uniq = F.concat(
        F.slice(uniq, 1, 31),
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda j: F.concat(F.lit("c"), F.col("id").cast("string"), F.lit("_"), j),
        ),
    )
    clones = (
        spark.range(n_docs)
        .where(F.col("id") % 200 == 0)
        .select((F.col("id") + n_docs).alias("doc_id"), F.concat(clone_uniq, hot).alias("shingles"))
    )
    corpus = base.unionByName(clones)
    planted = n_docs // 200

    t0 = time.perf_counter()
    pairs = prefix_jaccard_pairs(corpus, 0.7)
    n_pairs = pairs.count()
    t_ppj = round(time.perf_counter() - t0, 1)
    hot_pair_floor = 20 * (n_docs // 4 // 20) ** 2  # full-index hot-key pairs
    assert n_pairs == planted, f"expected {planted} planted pairs, got {n_pairs}"
    print(
        f"| prefix_jaccard_pairs | {n_docs:,} docs x 40 shingles, 20-key hot pool "
        f"| {n_pairs:,} pairs == planted; full-index hot floor ~{hot_pair_floor:.1e} pairs avoided "
        f"| {t_ppj}s |"
    )

    # --- asymmetric containment join -------------------------------------
    # train side: even ids, 100 shingles; eval side: odd ids, 20 shingles;
    # 1% of evals are subsets of train doc (id-1)
    train_sh = F.transform(
        F.sequence(F.lit(1), F.lit(100)),
        lambda j: F.concat(F.lit("t"), (F.col("id") / 2).cast("long").cast("string"), F.lit("_"), j),
    )
    eval_uniq = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda j: F.concat(F.lit("e"), F.col("id").cast("string"), F.lit("_"), j),
    )
    # swallowed evals copy train doc (id-1)'s first 20 shingles
    swallowed = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda j: F.concat(
            F.lit("t"), ((F.col("id") - 1) / 2).cast("long").cast("string"), F.lit("_"), j
        ),
    )
    cont_corpus = spark.range(2 * (n_docs // 10)).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, train_sh)
        .when(F.col("id") % 200 == 1, swallowed)
        .otherwise(eval_uniq)
        .alias("shingles"),
    )
    planted_cont = (2 * (n_docs // 10)) // 200
    t0 = time.perf_counter()
    cont = containment_pairs(cont_corpus, 0.5, lambda d: d % 2 == 1, lambda d: d % 2 == 0)
    n_cont = cont.count()
    n_exact = cont.where(F.col("containment") == 1.0).count()
    t_cont = round(time.perf_counter() - t0, 1)
    assert n_cont == planted_cont == n_exact, (n_cont, planted_cont, n_exact)
    print(
        f"| containment_pairs | {2 * (n_docs // 10):,} docs (evals 20-shingle, trains 100-shingle) "
        f"| {n_cont:,} swallowed evals found, all containment 1.0 (Jaccard 0.2 — symmetric join blind) "
        f"| {t_cont}s |"
    )


if __name__ == "__main__":
    main()
