"""Training-batch preparation operators over ``documents`` (SURVEY.md
§2.12 extensions): sequence packing, PII scrubbing, stratified sampling,
and sequence-length bucketing — the steps between a curated corpus and
a token stream feeding a trainer.

All hot-path logic is built-in column expressions (codegen, no Python);
hashes are md5 so the DuckDB oracles replicate bit-for-bit; every count
is emitted as an integer to avoid cross-engine float hazards
(DEVNOTES.md 1/5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import load_tables, register
from tcdb_spark.plans.queries_corpus import _TOKS_SQL, _tokens

PACK_BUDGET = 512  # tokens per training sequence


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    counted AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens FROM toks
    ), cum AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM counted
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST((cum_end - n_tokens) // {PACK_BUDGET} AS INTEGER) AS pack_id,
           CAST((cum_end - n_tokens) % {PACK_BUDGET} AS INTEGER) AS pack_offset,
           CAST(CASE WHEN (cum_end - 1) // {PACK_BUDGET}
                          > (cum_end - n_tokens) // {PACK_BUDGET}
                     THEN 1 ELSE 0 END AS INTEGER) AS straddles
    FROM cum
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    batcher): documents are laid end-to-end in deterministic doc_id
    order and cut into fixed ``PACK_BUDGET``-token sequences.  Each doc
    reports the pack it starts in, its offset there, and whether it
    straddles a boundary.  One global running sum — at 100 TB this
    would run per-shard (the same window partitioned by shard) since a
    total order is a single-reducer sort; the per-shard variant is the
    same expression with a partition key, so the oracle-checked math is
    identical."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum_end = F.sum("n_tokens").over(w)
    start = cum_end - F.col("n_tokens")
    # integer floor division on both sides: DuckDB CAST(double AS INT)
    # rounds while Spark's cast truncates, so float '/' must not appear
    return toks.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor(start / PACK_BUDGET).cast("int").alias("pack_id"),
        (start % PACK_BUDGET).cast("int").alias("pack_offset"),
        (F.floor((cum_end - 1) / PACK_BUDGET) > F.floor(start / PACK_BUDGET))
        .cast("int")
        .alias("straddles"),
    )


N_PACK_SHARDS = 8  # production sharding degree (grows with cluster size)


@register(
    "pack_sequences_sharded",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    counted AS (
        SELECT doc_id, CAST(doc_id % {N_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len(tokens) AS BIGINT) AS n_tokens
        FROM toks
    ), cum AS (
        SELECT doc_id, shard, n_tokens,
               sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM counted
    )
    SELECT doc_id, shard, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST((cum_end - n_tokens) // {PACK_BUDGET} AS INTEGER) AS pack_id,
           CAST((cum_end - n_tokens) % {PACK_BUDGET} AS INTEGER) AS pack_offset,
           CAST(CASE WHEN (cum_end - 1) // {PACK_BUDGET}
                          > (cum_end - n_tokens) // {PACK_BUDGET}
                     THEN 1 ELSE 0 END AS INTEGER) AS straddles
    FROM cum
    """,
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION twin of :func:`pack_sequences`: the identical
    concat-then-chunk running-sum expression, but the window is
    PARTITIONED by a deterministic shard key (doc_id mod
    ``N_PACK_SHARDS``), so the cumulative sum runs as
    ``N_PACK_SHARDS`` independent per-partition sorts instead of one
    single-reducer global sort.  Pack ids are shard-local — exactly how
    a trainer consumes them (each data-loader rank reads its own shard's
    packs).  This is the exact/production convention the ANN lane uses:
    ``pack_sequences`` attests the math with a total order,
    this entry attests the scale shape with the same math, and both are
    value-hash oracle-checked."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        (F.col("doc_id") % N_PACK_SHARDS).cast("int").alias("shard"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum_end = F.sum("n_tokens").over(w)
    start = cum_end - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor(start / PACK_BUDGET).cast("int").alias("pack_id"),
        (start % PACK_BUDGET).cast("int").alias("pack_offset"),
        (F.floor((cum_end - 1) / PACK_BUDGET) > F.floor(start / PACK_BUDGET))
        .cast("int")
        .alias("straddles"),
    )


_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IPV4}')) AS INTEGER) AS n_ips,
           CAST(length(regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_PHONE}', '<PHONE>', 'g'),
               '{_IPV4}', '<IP>', 'g')) AS INTEGER) AS scrubbed_len
    FROM documents
    WHERE length(trim(text)) > 0
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction accounting: per-doc counts of email/phone/IPv4
    patterns plus the post-redaction length.  Pure regexp column
    expressions (one scan, zero shuffles, codegen); the patterns are
    RE2-safe so Spark's Java regex and DuckDB's RE2 agree.  At 100 TB
    this is the shape you want: no UDF, no Python, embarrassingly
    parallel."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
        ),
        _IPV4,
        "<IP>",
    )
    return d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PHONE)).cast("int").alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(_IPV4)).cast("int").alias("n_ips"),
        F.length(scrubbed).cast("int").alias("scrubbed_len"),
    )


# per-language keep-rate in percent: downsample the head language,
# keep the tail (the standard corpus rebalancing move)
_STRATA_RATES = {"en": 40, "es": 80, "de": 80, "fr": 100, "zh": 100}
_DEFAULT_RATE = 100


@register(
    "stratified_sample",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, lang, n_chars,
               CASE lang
                   {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
                   ELSE {_DEFAULT_RATE}
               END AS rate,
               (ascii(substring(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 1)) * 256
                + ascii(substring(md5(CAST(doc_id AS VARCHAR) || ':sample'), 2, 1))) % 100
                   AS bucket
        FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM rated WHERE bucket < rate
    GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling: each language keeps a
    configured percentage, decided by a content-stable md5 bucket of the
    doc_id (NOT rand(): reproducible under any partitioning, re-run, or
    cluster size).  The rate map rides as a CASE expression — a
    broadcast-free literal plan; reported as per-language survivor
    accounting."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample")).cast("binary"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    rate = F.lit(_DEFAULT_RATE)
    for k, v in reversed(_STRATA_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return (
        d.where(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
    )


@register(
    "seq_len_buckets",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    counted AS (
        SELECT CAST(len(tokens) AS BIGINT) AS n_tokens FROM toks
    )
    SELECT CAST(power(2, CAST(floor(log2(n_tokens)) AS INTEGER)) AS BIGINT)
               AS bucket_floor,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM counted WHERE n_tokens > 0
    GROUP BY 1
    """,
)
def seq_len_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-two buckets — the input to
    choosing packing budgets and batch shapes.  Integer-exact: the
    bucket floor is 2^floor(log2(n)), computed identically in both
    engines on exact BIGINTs."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    bucket = F.pow(F.lit(2.0), F.floor(F.log2("n_tokens")).cast("int")).cast("bigint")
    return (
        toks.where(F.col("n_tokens") > 0)
        .groupBy(bucket.alias("bucket_floor"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# fixed classifier weights: [n_tokens/100, mean_token_len/10, stop_ratio,
# digit_ratio, caps_ratio] -> quality logit (a stand-in for a distilled
# fasttext-style quality model's linear head)
_W = [0.8, 0.5, -1.2, -2.0, -1.5]
_B = -0.3


@register(
    "quality_classifier",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents WHERE length(trim(text)) > 0
    ),
    feats AS (
        SELECT doc_id,
               len(tokens) / 100.0 AS f_len,
               (length(list_aggregate(tokens, 'string_agg', ''))
                   / CAST(len(tokens) AS DOUBLE)) / 10.0 AS f_tok_len,
               len(list_filter(tokens, t -> t IN
                   ('the','a','of','and','to','in','is')))
                   / CAST(len(tokens) AS DOUBLE) AS f_stop,
               (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) AS f_digit,
               (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) AS f_caps,
               text
        FROM toks WHERE len(tokens) > 0
    )
    SELECT doc_id,
           round({_W[0]} * f_len + {_W[1]} * f_tok_len + {_W[2]} * f_stop
                 + {_W[3]} * f_digit + {_W[4]} * f_caps + {_B}, 6) AS logit,
           CAST(CASE WHEN {_W[0]} * f_len + {_W[1]} * f_tok_len + {_W[2]} * f_stop
                 + {_W[3]} * f_digit + {_W[4]} * f_caps + {_B} > 0
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM feats
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference with a broadcast linear model: a fixed weight
    vector over cheap text features (token count, mean token length,
    stopword/digit/caps ratios), evaluated as pure column arithmetic —
    the 100 TB shape for a distilled quality model's linear head: no
    UDF, no model server, one scan, embarrassingly parallel.  The
    identical left-to-right multiply-add order on both engines makes
    the logit bit-stable before rounding.  (A real deployment swaps the
    literal weights for a broadcast variable and the features for model
    embeddings; the plan shape is unchanged.)"""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = _tokens(F.col("text"))
    base = (
        d.where(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "text", toks.alias("tokens"))
        .where(F.size("tokens") > 0)
    )
    n_tok = F.size("tokens").cast("double")
    joined_len = F.length(F.concat_ws("", F.col("tokens"))).cast("double")
    feats = [
        n_tok / 100.0,
        (joined_len / n_tok) / 10.0,
        F.size(
            F.filter(
                F.col("tokens"),
                lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"),
            )
        ).cast("double")
        / n_tok,
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[0-9]", "")))
        .cast("double")
        / F.length("text"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[A-Z]", "")))
        .cast("double")
        / F.length("text"),
    ]
    logit = F.lit(0.0)
    for w, f in zip(_W, feats):
        logit = logit + F.lit(w) * f
    logit = logit + F.lit(_B)
    return base.select(
        "doc_id",
        F.round(logit, 6).alias("logit"),
        (logit > 0).cast("int").alias("keep"),
    )


@register(
    "mix_temperature_sample",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(floor(sqrt(count(*))) AS BIGINT) AS isq
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(isq) AS BIGINT) AS s FROM counts),
    quota AS (SELECT lang, CAST((200 * isq) // s AS BIGINT) AS k FROM counts, tot),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.lang FROM ranked r JOIN quota q USING (lang) WHERE r.rn <= q.k
    """,
)
def mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the alpha-sampling of
    multilingual pretraining, alpha = 0.5): per-language quota
    proportional to sqrt(count), so dominant languages are flattened
    and low-resource ones up-weighted. All quota arithmetic is INTEGER
    (floor(sqrt(n)) is exact for bounded counts; `div` is integer
    division in both engines) — no float pow/sum ordering hazard —
    and selection is a deterministic md5 rank, so the sample is
    reproducible under any partitioning.

    Scale shape: counts + quotas are one tiny agg (broadcast back);
    the only data-sized operations are one window rank per language
    partition and the final filter.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    counts = d.groupBy("lang").agg(
        F.floor(F.sqrt(F.count(F.lit(1)))).cast("bigint").alias("isq")
    )
    tot = counts.agg(F.sum("isq").cast("bigint").alias("s"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "lang", F.expr("CAST((200 * isq) div s AS BIGINT)").alias("k")
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string")).cast("binary")),
            F.col("doc_id"),
        )
    )
    return (
        d.select("doc_id", "lang").withColumn("rn", rn)
        .join(F.broadcast(quota), "lang")
        .where(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )
