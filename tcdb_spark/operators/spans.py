"""Exact duplicated-span detection — substring-level dedup in the style
of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022, arXiv:2107.06499).  Document-level dedup (exact or
MinHash) misses the dominant failure mode of web corpora: long shared
passages (licenses, boilerplate, quoted text) embedded in otherwise
distinct documents.  The published approach finds duplicated substrings
with a corpus-wide suffix array; a suffix array is inherently
sequential to build, so the Spark-native equivalent is the standard
scalable approximation: fixed-width token windows, hash-grouped.

Plan shape (all built-ins, zero Python in the hot path):

1. per-doc token windows of width ``w`` via ``transform(sequence(...))``
   + ``posexplode`` — embarrassingly parallel, no shuffle;
2. one shuffle on ``xxhash64(window)`` (8-byte key, not the ~70-byte
   text) to find windows occurring in >1 document and their owner
   (min doc_id) — map-side partial agg applies;
3. occurrences outside the owner doc become covered token intervals
   ``[start, start+w-1]``; overlapping/adjacent intervals merge into
   maximal removal spans per doc with a gaps-and-islands window (one
   shuffle on doc_id).

At 100 TB both shuffles are on uniform keys (hashes / doc ids); the
window explode multiplies rows by ~tokens-per-doc but each row is an
(8B hash, int) pair after projection.  Collision tolerance: two distinct
windows sharing an xxhash64 is ~2^-64 per pair and would only ever
*add* a span — the published pipelines accept the same risk for the
same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def token_windows(tokens: Column, w: int) -> Column:
    """All width-``w`` token windows as space-joined strings (empty
    array when the doc is shorter than ``w`` — guarded explicitly:
    ``sequence(1, 0)`` steps DESCENDING in Spark, it is not empty)."""
    windows = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (w - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + k) for k in range(w)]),
    )
    return F.when(F.size(tokens) >= w, windows).otherwise(
        F.array().cast("array<string>")
    )


def duplicated_spans(docs: DataFrame, w: int = 10) -> DataFrame:
    """Maximal cross-document duplicated token spans.

    ``docs`` needs columns ``(doc_id, tokens)``.  A window duplicated
    across documents is owned by its minimum doc_id; every occurrence in
    any OTHER document is marked for removal, and marked intervals are
    merged per doc.  Returns one row per maximal span:
    ``(doc_id, span_start, span_end, span_len)`` with 1-based inclusive
    token positions.
    """
    wins = docs.select(
        "doc_id",
        F.posexplode(token_windows(F.col("tokens"), w)).alias("pos0", "win"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("start"),
        F.xxhash64("win").alias("h"),
    )
    # barrier: owners agg AND the probe join both read the windowed
    # corpus — without it the explode+hash pipeline runs twice
    # (same fix as the jaccard inverted index, DEVNOTES #13)
    wins = wins.persist()
    # shuffle 1: owner + cross-doc test per window hash
    owners = wins.groupBy("h").agg(
        F.min("doc_id").alias("owner_doc"),
        F.countDistinct("doc_id").alias("ndocs"),
    )
    covered = (
        wins.join(owners.where(F.col("ndocs") > 1), "h")
        .where(F.col("doc_id") != F.col("owner_doc"))
        .select("doc_id", "start", (F.col("start") + (w - 1)).alias("end"))
    )
    # shuffle 2: gaps-and-islands merge of overlapping/adjacent intervals
    ord_w = W.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max("end").over(ord_w.rowsBetween(W.unboundedPreceding, -1))
    flagged = covered.withColumn(
        "brk",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("brk").over(ord_w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("start").cast("int").alias("span_start"),
        F.max("end").cast("int").alias("span_end"),
        (F.max("end") - F.min("start") + 1).cast("int").alias("span_len"),
    ).drop("island")


def span_index(docs: DataFrame, w: int = 10) -> DataFrame:
    """Append-only window-hash index for INCREMENTAL span dedup:
    ``(h, owner_doc)`` — one row per distinct window hash with its
    minimum doc_id.  Build once over the existing corpus, then each
    daily batch probes and extends it (the span twin of the
    incremental LSH dedup index): the corpus is never re-windowed."""
    wins = docs.select(
        "doc_id",
        F.explode(token_windows(F.col("tokens"), w)).alias("win"),
    ).select("doc_id", F.xxhash64("win").alias("h"))
    return wins.groupBy("h").agg(F.min("doc_id").alias("owner_doc"))


def incremental_duplicated_spans(
    index: DataFrame, new_docs: DataFrame, w: int = 10
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Duplicated spans of an incoming batch against (corpus index +
    the batch itself), plus the updated index.

    Returns ``(spans, new_index, fresh)`` — ``fresh`` is the index
    DELTA (hashes first seen in this batch with their owners), so an
    append-only physical index just writes ``fresh`` as new files and
    never rewrites a byte of the existing index (the streaming sink
    does exactly that).  With monotonically increasing
    doc_ids (the ingest contract), the union of per-batch results
    equals a one-shot :func:`duplicated_spans` over the whole corpus —
    pinned by test.  Scale shape: the batch is windowed once (not the
    corpus), the probe is an equi-join on the 8-byte hash against the
    bucketable index, and the index update is an append of previously
    unseen hashes — O(batch) work per batch, never O(corpus).
    """
    wins = new_docs.select(
        "doc_id",
        F.posexplode(token_windows(F.col("tokens"), w)).alias("pos0", "win"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("start"),
        F.xxhash64("win").alias("h"),
    )
    wins = wins.persist()  # probe + intra-batch owners + index delta share it
    batch_owners = wins.groupBy("h").agg(
        F.min("doc_id").alias("batch_owner"),
        F.countDistinct("doc_id").alias("batch_ndocs"),
    )
    idx = index.select("h", F.col("owner_doc").alias("index_owner"))
    probed = (
        wins.join(batch_owners, "h")
        .join(idx, "h", "left")
        .where(
            F.col("index_owner").isNotNull()  # seen in the corpus
            | (
                (F.col("batch_ndocs") > 1)  # or duplicated inside the batch
                & (F.col("doc_id") != F.col("batch_owner"))
            )
        )
        .select("doc_id", "start", (F.col("start") + (w - 1)).alias("end"))
    )
    ord_w = W.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max("end").over(ord_w.rowsBetween(W.unboundedPreceding, -1))
    flagged = probed.withColumn(
        "brk",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("brk").over(ord_w.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("start").cast("int").alias("span_start"),
        F.max("end").cast("int").alias("span_end"),
        (F.max("end") - F.min("start") + 1).cast("int").alias("span_len"),
    ).drop("island")
    fresh = (
        batch_owners.join(idx, "h", "left_anti")
        .select("h", F.col("batch_owner").alias("owner_doc"))
    )
    return spans, index.unionByName(fresh), fresh
