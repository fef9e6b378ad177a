"""Generic evaluation operators: retrieval metrics (P@k, MRR, nDCG@k)
over any scored candidate frame, and score-calibration bins over any
(score, label) frame.  The catalog lanes in plans/queries_eval.py are
these operators applied to the embeddings testdata; Engine.retrieval_eval
and Engine.calibration expose them on user frames.

Float discipline (DEVNOTES #23): metrics are integer counts, exact
single divisions, and FIXED-ORDER literal DCG/IDCG ladders — no
unordered float SUM feeds an unrounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dcg_ladder(k: int) -> str:
    """Fixed-order DCG@k over pivoted rel_1..rel_k columns (SQL text,
    parses identically in Spark and DuckDB)."""
    return " + ".join(
        f"(CAST(rel_{i} AS DOUBLE) / log2({i + 1}.0))" for i in range(1, k + 1)
    )


def idcg_ladder(k: int) -> str:
    """Fixed-order ideal-DCG@k given total relevant count n_rel."""
    return " + ".join(
        f"(CASE WHEN n_rel >= {i} THEN CAST(1 AS DOUBLE) / log2({i + 1}.0) "
        "ELSE CAST(0 AS DOUBLE) END)"
        for i in range(1, k + 1)
    )


def precision_expr(k: int) -> str:
    return (
        "CAST(("
        + " + ".join(f"rel_{i}" for i in range(1, k + 1))
        + f") AS DOUBLE) / {k}"
    )


MRR_EXPR = (
    "CASE WHEN first_rel IS NULL THEN CAST(0 AS DOUBLE) "
    "ELSE CAST(1 AS DOUBLE) / first_rel END"
)


def retrieval_eval(
    cands: DataFrame,
    q_col: str = "q_id",
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Per-query P@k, MRR and nDCG@k from a scored candidate frame (one
    row per (query, candidate), ``rel_col`` in {0, 1}).

    Shape: the per-query rank window is bounded by that query's
    candidate set (partitioned, never global); everything after the
    top-k pivot runs on #queries rows.  Ties break on ``id_col`` so
    ranks are deterministic.

    Degenerate inputs are first-class (arbitrary ANN/hybrid output hits
    both routinely): a query with FEWER than k candidates leaves the
    missing rel_i slots NULL after the pivot — they coalesce to 0 so
    p@k and the DCG ladder treat absent ranks as non-relevant instead
    of going NULL; a query with ZERO relevant candidates has IDCG = 0 —
    nDCG is undefined there, so it returns NULL (never a 0/0 division,
    which raises under the ANSI default) and drops out of downstream
    averages explicitly rather than crashing the job (DEVNOTES #44
    convention, same as cohen_kappa / acf_lags)."""
    # n_rel rides the SAME per-query window pass as the ranking (an
    # unordered whole-partition frame shares the rank window's exchange
    # and sort) — the former separate groupBy aggregate + equi-join back
    # was a second full shuffle of the candidate frame at any scale.
    # Pivot columns build as server-parsed expression strings: the
    # Column-by-Column form cost ~6 py4j round-trips per rank slot
    # (round 8: retrieval_eval was 0.3 s of pure plan construction).
    w = W.partitionBy(q_col).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = (
        cands.select(
            "*",
            F.row_number().over(w).alias("rnk"),
            F.sum(rel_col).over(W.partitionBy(q_col)).cast("bigint").alias("n_rel"),
        )
        .where(F.col("rnk") <= k)
    )
    pivoted = ranked.groupBy(q_col).agg(
        F.max("n_rel").alias("n_rel"),
        *[
            F.expr(
                f"coalesce(max(CASE WHEN rnk = {i} THEN `{rel_col}` END), 0)"
            ).alias(f"rel_{i}")
            for i in range(1, k + 1)
        ],
        F.expr(f"min(CASE WHEN `{rel_col}` = 1 THEN rnk END)").alias("first_rel"),
    )
    return pivoted.selectExpr(
        q_col,
        "n_rel",
        f"{precision_expr(k)} AS p_at_{k}",
        f"round({MRR_EXPR}, 6) AS mrr",
        f"CASE WHEN n_rel = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE round(({dcg_ladder(k)}) / ({idcg_ladder(k)}), 6) END AS ndcg_at_{k}",
    )


def calibration(
    scored: DataFrame,
    score_col: str = "score",
    pos_col: str = "pos",
    bins: int = 16,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability diagram: equal-width bins of ``score_col`` over
    [lo, hi] with per-bin count, positive count, observed positive rate
    and mean score (``pos_col`` in {0, 1}).  Scores are rounded to 6
    decimals BEFORE binning so engines that differ below the rounding
    grain still bin identically; out-of-range scores clamp to the edge
    bins.  One integer-count aggregate; output is ``bins`` rows."""
    width = (hi - lo) / bins
    binned = scored.select(
        F.col(pos_col).alias("pos"),
        F.round(F.col(score_col), 6).alias("score"),
    ).select(
        "pos",
        "score",
        F.greatest(
            F.least(F.floor((F.col("score") - lo) / width), F.lit(bins - 1)),
            F.lit(0),
        ).cast("int").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("positives"),
        F.round(F.sum("pos").cast("double") / F.count("*"), 6).alias("pos_rate"),
        F.round(F.avg("score"), 6).alias("mean_score"),
    )
