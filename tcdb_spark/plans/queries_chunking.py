"""Document chunking for context-window preparation (SURVEY.md §2.12
extension; the row-expanding cousin of pack_sequences) — and the Python
UDTF (table function) API surface, §2.11.

Two implementations of the SAME semantics share one oracle:

- ``chunk_text_builtin`` — pure column expressions (sequence + slice +
  posexplode), whole-stage codegen, zero Python. THE recommended plan:
  chunking 100 TB is a per-row map, and this one never leaves the JVM.
- ``udtf_chunk_text`` — a Python UDTF (``@udtf``, Spark 4 table-function
  API) covering the lateral-expansion surface the way grouped_map_zscore
  covers applyInPandas: real API coverage, deliberately NOT the
  recommended plan. ``useArrow=True`` keeps it on the Arrow batch path
  (ArrowEvalPythonUDTF — the sanctioned Python lane in PLAN_LINT.md).

Chunk rule (deterministic): whitespace tokens; windows of CHUNK tokens
starting every STRIDE tokens from 0 while start < n_tokens; the last
window may be short. Empty/blank documents produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.plans.catalog import load_tables, register

CHUNK = 32
STRIDE = 24

_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents WHERE length(trim(text)) > 0
    ), starts AS (
        SELECT doc_id, tokens, unnest(generate_series(0, len(tokens) - 1, {STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST(start / {STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(tokens, start + 1, start + {CHUNK}), ' ') AS chunk,
           CAST(least({CHUNK}, len(tokens) - start) AS INTEGER) AS chunk_tokens
    FROM starts
"""


def chunk_text_expr(docs: DataFrame, chunk: int = CHUNK, stride: int = STRIDE) -> DataFrame:
    """Overlapping token-window chunking as pure column expressions:
    tokenize once, generate window starts with ``sequence`` (guarded —
    DEVNOTES #25: sequence steps descending when end < start), slice +
    join per window, one posexplode. Per-row map work, no shuffle."""
    toks = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens")
    )
    n = F.size("tokens")
    starts = F.when(n >= 1, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.array_join(F.slice("tokens", s + 1, chunk), " ").alias("chunk"),
            F.least(F.lit(chunk), n - s).cast("int").alias("chunk_tokens"),
        ),
    )
    return toks.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.chunk", "c.chunk_tokens"
    )


@register("chunk_text_builtin", oracle=_ORACLE)
def chunk_text_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking, codegen path (module docstring)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return chunk_text_expr(d)


def _make_chunk_udtf():
    """Build the UDTF lazily so importing this module never requires a
    live session; Arrow path keeps batches columnar driver<->worker."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, chunk_tokens int", useArrow=True)
    class ChunkText:
        def eval(self, text: str):  # noqa: D102 — UDTF contract
            if text is None or not text.strip():
                return
            tokens = text.strip().split()
            for idx, start in enumerate(range(0, len(tokens), STRIDE)):
                window = tokens[start : start + CHUNK]
                yield idx, " ".join(window), len(window)

    return ChunkText


@register("udtf_chunk_text", oracle=_ORACLE)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same chunking through a Python UDTF lateral join — §2.11
    table-function surface. Semantics pinned to the builtin twin by the
    shared oracle; keep the builtin for hot paths."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    chunker = _make_chunk_udtf()
    spark.udtf.register("chunk_text", chunker)
    d.where(F.length(F.trim(F.col("text"))) > 0).createOrReplaceTempView("__docs_to_chunk")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
        FROM __docs_to_chunk d, LATERAL chunk_text(d.text) c
        """
    )
