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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketches.
#
# HLL (queries_stats' monitors) unions beautifully but cannot INTERSECT;
# the corpus questions "how many tokens/urls/docs do snapshot A and B
# share" need a bottom-k sketch: keep the k smallest 64-bit key hashes
# per group.  Union = k smallest of the concatenation (mergeable,
# associative, idempotent); intersection over a pair uses the pair's
# combined threshold theta = min(theta_a, theta_b) and counts shared
# hashes below it (Beyer et al., "On Synopses for Distinct-Value
# Estimation Under Multiset Operations", SIGMOD 2007).
#
# EXACT-MODE DEGENERACY (the oracle discipline shared with the ANN
# lanes): a sketch whose group has fewer than k distinct keys retains
# ALL hashes and theta = 1, so every estimate below is provably the
# exact distinct/intersection count — DuckDB-attestable bit-for-bit.
# Pruned-k accuracy is pytest-gated (stderr ~ 1/sqrt(k)).
#
# Scale shape: build is distinct + one per-group window top-k (two
# hash-partitioned exchanges on the SAME key, AQE-coalesced); sketch
# rows are <= k longs per group — bounded regardless of input rows.
# Pairwise overlap EXPLODES the bounded sketches and equi-joins on the
# hash value (never a cartesian; G^2 pair keys only materialize for
# pairs that actually share hashes, plus a broadcast meta join for the
# thetas).
# ---------------------------------------------------------------------------

_HASH_SPACE = float(2**64)


def kmv_sketch(df: DataFrame, group_col: str, key_col: str, k: int) -> DataFrame:
    """-> one row per group: sorted ``hashes`` (k smallest distinct
    xxhash64 of the key), ``n_kept``, ``is_exact`` (kept everything:
    estimates are exact counts), ``kth`` (the threshold hash)."""
    h = df.select(group_col, F.xxhash64(key_col).alias("h")).distinct()
    w = W.partitionBy(group_col).orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("hashes"),
        F.count("*").cast("long").alias("n_kept"),
        (F.count("*") < k).alias("is_exact"),
        F.max("h").alias("kth"),
    )


def kmv_merge(sketches: DataFrame, group_col: str, k: int) -> DataFrame:
    """Merge sketch rows sharing a group (e.g. partial sketches from
    incremental batches): k smallest of the union, same schema out.
    Idempotent — re-merging a sketch with itself is a no-op."""
    h = sketches.select(group_col, F.explode("hashes").alias("h")).distinct()
    w = W.partitionBy(group_col).orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("hashes"),
        F.count("*").cast("long").alias("n_kept"),
        (F.count("*") < k).alias("is_exact"),
        F.max("h").alias("kth"),
    )


def _theta_frac(is_exact, kth) -> "F.Column":
    """Fraction of the signed-64 hash space at or below the threshold;
    1.0 for an exact sketch."""
    return F.when(is_exact, F.lit(1.0)).otherwise(
        (kth.cast("double") + F.lit(float(2**63) + 1.0)) / F.lit(_HASH_SPACE)
    )


def kmv_estimate(sk: DataFrame, group_col: str) -> DataFrame:
    """Per-group distinct estimate: exact ``n_kept`` when the sketch is
    exact, else the KMV estimator (k-1)/theta."""
    est = F.when(F.col("is_exact"), F.col("n_kept").cast("double")).otherwise(
        (F.col("n_kept") - 1).cast("double")
        / _theta_frac(F.col("is_exact"), F.col("kth"))
    )
    return sk.select(group_col, F.round(est).cast("long").alias("est_distinct"))


def kmv_overlap(sk: DataFrame, group_col: str) -> DataFrame:
    """All-pairs overlap estimates from one sketch table.

    Returns (group_a, group_b, est_a, est_b, est_intersection,
    est_union, jaccard_bp) with group_a < group_b.  In exact mode every
    column is an exact integer (jaccard as floor basis points).  The
    hash equi-join only moves the bounded sketch rows; group metas ride
    a broadcast."""
    # Projections build as server-parsed expression strings — the
    # Column-by-Column form cost ~0.3 s of pure py4j round-trips per
    # build (round 8, cProfile: ~1600 socket reads).  Value-exact: the
    # same casts and the same double literals (repr round-trips), so
    # the parsed AST matches the Column form it replaces.
    _off = repr(float(2**63) + 1.0)

    def _theta(sfx: str) -> str:
        return (
            f"CASE WHEN is_exact{sfx} THEN CAST(1.0 AS DOUBLE) "
            f"ELSE (CAST(kth{sfx} AS DOUBLE) + {_off}) / {repr(_HASH_SPACE)} END"
        )

    meta = sk.selectExpr(f"`{group_col}` AS g", "n_kept", "is_exact", "kth")
    ex = sk.selectExpr(f"`{group_col}` AS g", "explode(hashes) AS h")
    a, b = ex.alias("a"), ex.alias("b")
    shared = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.g") < F.col("b.g"))
    ).selectExpr("a.g AS ga", "b.g AS gb", "a.h AS h")
    ma = F.broadcast(meta.selectExpr(
        "g AS ga", "n_kept AS n_kept_a", "is_exact AS is_exact_a", "kth AS kth_a"))
    mb = F.broadcast(meta.selectExpr(
        "g AS gb", "n_kept AS n_kept_b", "is_exact AS is_exact_b", "kth AS kth_b"))
    j = shared.join(ma, "ga").join(mb, "gb")
    # the pair's threshold: hashes above EITHER side's theta are not
    # comparable samples — drop them (no-op when both sides exact)
    cnt = (
        j.where(F.expr(
            "h <= least("
            "CASE WHEN is_exact_a THEN 9223372036854775807 ELSE kth_a END, "
            "CASE WHEN is_exact_b THEN 9223372036854775807 ELSE kth_b END)"
        ))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("n_shared"))
    )
    # Pairs whose sketches share NO sampled hash are omitted — their
    # estimated intersection is 0 (materializing all G^2 pairs would
    # need an inequality-only join, i.e. a cartesian; callers wanting
    # explicit zeros can outer-join a group list in 2 lines).
    out = cnt.join(ma, "ga").join(mb, "gb")
    ests = out.selectExpr(
        "ga", "gb",
        f"CASE WHEN is_exact_a THEN CAST(n_kept_a AS DOUBLE) "
        f"ELSE CAST(n_kept_a - 1 AS DOUBLE) / ({_theta('_a')}) END AS __est_a",
        f"CASE WHEN is_exact_b THEN CAST(n_kept_b AS DOUBLE) "
        f"ELSE CAST(n_kept_b - 1 AS DOUBLE) / ({_theta('_b')}) END AS __est_b",
        f"CAST(n_shared AS DOUBLE) / least({_theta('_a')}, {_theta('_b')}) AS __est_i",
    )
    return ests.selectExpr(
        "ga AS group_a",
        "gb AS group_b",
        "CAST(round(__est_a) AS BIGINT) AS est_a",
        "CAST(round(__est_b) AS BIGINT) AS est_b",
        "CAST(round(__est_i) AS BIGINT) AS est_intersection",
        "CAST(round(greatest(__est_a + __est_b - __est_i, __est_i)) AS BIGINT) AS est_union",
    ).selectExpr(
        "*",
        "CAST(CASE WHEN est_union > 0 THEN (10000 * est_intersection) div est_union "
        "ELSE 0 END AS BIGINT) AS jaccard_bp",
    )
