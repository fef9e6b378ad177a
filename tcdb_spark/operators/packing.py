"""Boundary-respecting sequence packing (first-fit-decreasing).

The concat-then-chunk packer (plans/queries_packing.pack_sequences)
maximizes token utilization but lets documents straddle sequence
boundaries; attention-mask-aware trainers prefer every document whole
inside one sequence. That is bin packing — NP-hard exactly, and the
standard practical answer is first-fit-decreasing (FFD), which is a
genuinely sequential greedy: each document's bin depends on every
earlier placement, so it cannot be a window/column expression. This is
the legitimate applyInPandas case (SURVEY.md §2.11): shard the corpus
by a deterministic hash, run FFD per shard in pandas, emit (doc, bin)
assignments.

Scale shape: shards are independent (one shuffle on the shard key);
within a shard FFD is O(n log n) in documents. Bin ids are globally
unique via (shard, local bin). Documents longer than the budget get a
single-document overflow bin, flagged — the caller decides to truncate
or split them upstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "doc_id long, shard int, bin_id long, n_tokens int, overflow boolean"
)


def pack_bins_ffd(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
) -> DataFrame:
    """Assign every document to a packed training sequence of at most
    ``budget`` tokens, never splitting a document (first-fit-decreasing
    per hash shard). Deterministic: shard = hash(doc_id) and FFD order
    is (n_tokens desc, doc_id asc), so retries and different input
    partitionings produce identical assignments."""

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0])
        bins: list[int] = []  # remaining capacity per bin
        out_bin: list[int] = []
        overflow: list[bool] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                bins.append(0)  # dedicated overflow bin, full
                out_bin.append(len(bins) - 1)
                overflow.append(True)
                continue
            placed = False
            for i, cap in enumerate(bins):
                if cap >= n:
                    bins[i] = cap - n
                    out_bin.append(i)
                    overflow.append(False)
                    placed = True
                    break
            if not placed:
                bins.append(budget - n)
                out_bin.append(len(bins) - 1)
                overflow.append(False)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "shard": shard,
                "bin_id": [shard * 10_000_000 + b for b in out_bin],
                "n_tokens": pdf["n_tokens"].values,
                "overflow": overflow,
            }
        )

    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(len_col).cast("int").alias("n_tokens"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
    )
    return sized.groupBy("shard").applyInPandas(_ffd, schema=PACKED_SCHEMA)


def training_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: str = "ep1",
) -> DataFrame:
    """Deterministic two-level training-order shuffle (see
    queries_training.training_order_shuffle): seeded content hash ->
    shard assignment + in-shard rank.  Reproducible across
    partitionings and cluster sizes; changing ``seed`` yields a fresh
    epoch permutation.  One hash shuffle + per-shard window; no global
    sort."""
    from pyspark.sql.window import Window as W

    hx = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast("binary")
    )
    withh = docs.select(
        id_col,
        hx.alias("__hx"),
        (
            (F.ascii(F.substring(hx, 1, 1)) * 256 + F.ascii(F.substring(hx, 2, 1)))
            % n_shards
        ).cast("int").alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy("__hx", id_col)
    return withh.select(
        id_col, "shard_id", F.row_number().over(w).alias("shard_rank")
    )


def negative_pairs(
    items: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 4,
    step: int = 97,
) -> DataFrame:
    """Ring-stride contrastive negative sampling (see
    queries_training.negative_pair_sample): O(k·N) candidate rows and
    ONE equi-join instead of an anchors×corpus cross join.  Ids must be
    dense 0..N-1 (the usual contract after a zipWithIndex-style
    re-keying); same-label accidental positives are filtered."""
    base = items.select(id_col, label_col)
    cnt = base.agg(F.count("*").alias("__n"))
    pairs = (
        base.crossJoin(F.broadcast(cnt))
        .select(
            id_col,
            label_col,
            "__n",
            F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
        )
        .withColumn(
            "neg_id", (F.col(id_col) + F.col("j") * F.lit(step)) % F.col("__n")
        )
    )
    partners = base.select(
        F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label")
    )
    return (
        pairs.join(partners, "neg_id")
        .where(
            (F.col("neg_label") != F.col(label_col))
            & (F.col("neg_id") != F.col(id_col))
        )
        .select(id_col, "j", "neg_id", label_col, "neg_label")
    )
