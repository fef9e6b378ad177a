"""Mergeable frequency sketches — the shuffle-light path for heavy-hitter
mining over token/n-gram streams (SURVEY.md §2.12 extension; the
reference has no sketch machinery, its corpora fit a single MySQL box —
at 100 TB the naive ``GROUP BY token`` shuffles every distinct n-gram).

Misra-Gries summaries are mergeable (Agarwal et al., "Mergeable
Summaries", PODS 2012): a per-partition summary of capacity ``c``
undercounts any item by at most ``N_p/(c+1)`` of that partition's
``N_p`` items.  Pigeonhole over partitions: if an item's GLOBAL count
exceeds ``N/(c+1)`` it must exceed ``N_p/(c+1)`` in at least one
partition, hence it survives in that partition's summary.  So with
``c >= k`` the UNION of per-partition summaries is a guaranteed
superset of every item with count >= N/k — the exact-recount pass then
restores exact counts for that small candidate set.

Scale shape: the sketch pass is map-side only (one ``mapInPandas`` over
the token column, no shuffle); the shuffle that remains moves
``partitions x capacity`` candidate rows instead of the full distinct
vocabulary, and the recount joins a BROADCAST candidate list back to
the tokens.  Python cost is Arrow-batched and O(1) amortized per token
(lazy global-decrement via an offset, not a dict sweep).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def misra_gries_partials(tokens: DataFrame, col: str, capacity: int) -> DataFrame:
    """One Misra-Gries summary row set per partition: ``(token, wt)``
    where ``wt`` is the summary's (under-)count.  ``wt`` is a lower
    bound on the partition count; its only guaranteed use is membership
    (candidate generation) — recount before reporting numbers.
    """
    import pandas as pd

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batched MG MERGE (Agarwal et al. §2.1), not the textbook
        # per-token loop: each Arrow batch's value_counts is an exact
        # summary; merging two summaries = add counts, subtract the
        # (capacity+1)-th largest, prune non-positive. All three steps
        # are vectorized pandas (C speed) — the per-token dict loop with
        # its O(capacity) decrement-all sweep goes quadratic on
        # near-unique streams.
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            combined = summary.add(vc, fill_value=0)
            if len(combined) > capacity:
                thresh = combined.nlargest(capacity + 1).iloc[-1]
                combined = combined[combined > thresh] - thresh
            summary = combined
        if len(summary):
            yield pd.DataFrame(
                {"token": summary.index.astype(str), "wt": summary.values.astype("int64")}
            )

    return tokens.select(F.col(col).alias(col)).mapInPandas(
        summarize, "token string, wt long"
    )


def heavy_hitters_exact(
    tokens: DataFrame, col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Items with global count*k >= N, with EXACT counts, found via the
    sketch-then-recount plan: MG candidates (superset guarantee above)
    -> broadcast candidate list -> one filtered groupBy -> scalar
    threshold.  Returns ``(token, cnt)``; the output is exact, so it is
    DuckDB-oracle-checkable even though a sketch prunes the search.
    """
    capacity = capacity or 4 * k
    toks = tokens.select(F.col(col).alias("token")).where(F.col("token").isNotNull())
    # barrier: the sketch pass, the recount, and the total all read the
    # tokenization exactly once
    toks = toks.persist()
    candidates = (
        misra_gries_partials(toks, "token", capacity).select("token").distinct()
    )
    counts = (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = toks.select(F.count(F.lit(1)).alias("__n"))
    # 1-row scalar threshold cross — allowlisted BNLJ shape
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k >= F.col("__n"))
        .select("token", "cnt")
    )


def hist_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Equi-width histogram partials — the mergeable quantile summary
    (the fixed-binning cousin of t-digest/KLL: coarser but exactly
    deterministic, so the DuckDB oracle reproduces it bit-for-bit).
    One row per (group, bin); merging shards/batches is a SUM on
    (group, bin) — the same mergeable-state contract as the
    HLL/Misra-Gries summaries in this module, composing with the
    incremental-rollup pattern (state keyed one level finer).  Values
    outside [lo, hi) clamp to the edge bins."""
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
        ),
    ).cast("int")
    return (
        df.groupBy(*group_cols, bin_col.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantile(
    partials: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from histogram partials: walk the cumulative
    bin counts to the first bin covering q*total, interpolate linearly
    inside it.  The estimate lands in the bin holding the ceil(q*n)-th
    order statistic, so error vs that order stat is bounded by one bin
    width (test-gated; note interpolated ``percentile()`` is a
    different estimator and can sit an order-statistic gap away in a
    sparse tail).  All arithmetic is integer counts plus one
    division, so the estimate is cross-engine exact (no order-dependent
    float sums)."""
    width = (hi - lo) / n_bins
    w = W.partitionBy(*group_cols).orderBy("bin")
    cum = partials.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(W.partitionBy(*group_cols))
    )
    out = None
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("total"))
        # the first bin whose cumulative count reaches the target
        hit = (
            cum.where(F.col("cum") >= target)
            .withColumn(
                "__rn",
                F.row_number().over(W.partitionBy(*group_cols).orderBy("bin")),
            )
            .where(F.col("__rn") == 1)
        )
        frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        est = hit.select(
            *group_cols,
            F.lit(q).alias("q"),
            F.round(F.lit(lo) + (F.col("bin") + frac) * F.lit(width), 4).alias("est"),
        )
        out = est if out is None else out.unionByName(est)
    return out
