"""Corpus-curation operators beyond the per-doc text signals
(SURVEY.md §2.12 extensions): n-gram repetition signals, percentile
quality cuts, deterministic train/val/test splits, train-vs-eval
contamination checking, and transitive duplicate clustering.

These are the set-level jobs a 100 TB pretraining pipeline runs after
the per-document scoring pass.  All counts are emitted as integers
(never rounded ratios) so the DuckDB oracle compares bit-exactly
(DEVNOTES.md hazards 1/5).  Hashes are md5 over strings — identical in
both engines — and the split bucket is derived from md5 hex chars with
plain ascii arithmetic, so no engine-specific hash function appears
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import ORACLES, load_tables, register
from tcdb_spark.plans.queries_dedup_near import dedup_minhash_lsh


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


_TOKS_SQL = """
    SELECT doc_id, lang, source, n_chars,
           regexp_split_to_array(trim(text), '\\s+') AS tokens
    FROM documents WHERE length(trim(text)) > 0
"""


def _ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (JVM-side transform over a
    generated index sequence — no shuffle, no Python)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + k) for k in range(n)]),
    )


def _ngrams_sql(n: int) -> str:
    return (
        f"list_transform(range(1, len(tokens) - {n - 2}), i -> "
        + " || ' ' || ".join(f"tokens[i+{k}]" for k in range(n))
        + ")"
    )


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL})
    SELECT doc_id,
           CAST(len(tokens) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(tokens)) AS INTEGER) AS n_distinct_tokens,
           CAST(len(list_distinct({_ngrams_sql(2)})) AS INTEGER) AS n_distinct_bigrams,
           CAST(len(list_distinct({_ngrams_sql(3)})) AS INTEGER) AS n_distinct_trigrams,
           CAST(length(array_to_string(tokens, '')) AS INTEGER) AS total_token_chars,
           CAST(list_max(list_transform(tokens, t -> length(t))) AS INTEGER) AS max_token_len
    FROM toks WHERE len(tokens) >= 3
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style repetition signals: distinct-token and
    distinct-n-gram counts per document.  Downstream filters derive the
    duplicate-n-gram fractions (1 - distinct/total); we emit the raw
    integer counts so the oracle comparison is float-free.  Per-row
    array ops only — the job is embarrassingly parallel with zero
    shuffles at any scale."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    return toks.where(F.size("tokens") >= 3).select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("int").alias("n_distinct_tokens"),
        F.size(F.array_distinct(_ngrams(F.col("tokens"), 2))).cast("int").alias("n_distinct_bigrams"),
        F.size(F.array_distinct(_ngrams(F.col("tokens"), 3))).cast("int").alias("n_distinct_trigrams"),
        F.length(F.concat_ws("", F.col("tokens"))).cast("int").alias("total_token_chars"),
        F.array_max(F.transform(F.col("tokens"), lambda t: F.length(t))).cast("int").alias("max_token_len"),
    )


@register(
    "quality_percentile_cut",
    oracle="""
    WITH kept AS (
        SELECT lang, n_chars FROM documents
        QUALIFY percent_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) <= 0.5
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars_kept
    FROM kept GROUP BY lang
    """,
)
def quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile cut: keep the top half of each language
    by a quality proxy (n_chars), the way corpus curation keeps the top
    X% by classifier score.  percent_rank = (rank-1)/(n-1) is an exact
    double in both engines; ties share a rank so the cut is
    deterministic.  At scale this is one shuffle (window partition) and
    the groupBy reuses the same hash partitioning."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc())
    kept = d.select("lang", "n_chars", F.percent_rank().over(w).alias("__pr")).where(
        F.col("__pr") <= 0.5
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars_kept"),
    )


# Split buckets from md5 hex chars via ascii arithmetic: engine-neutral,
# stable across runs/partitionings (unlike rand() or xxhash64, which
# DuckDB lacks). 80/10/10.
_BUCKET_SQL = (
    "(ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100"
)


@register(
    "split_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT lang, n_chars,
               CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                    WHEN {_BUCKET_SQL} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a content-
    stable hash bucket — reproducible under any partitioning, re-run, or
    cluster size (the property rand(seed) does NOT give across repartitions).
    Reported as per-(split, lang) stratification counts."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    assigned = d.select(
        "lang",
        "n_chars",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


TRIGRAM_DF_CAP = 100  # trigrams in more train docs than this are boilerplate


@register(
    "contamination_check",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tri AS (
        SELECT doc_id, list_distinct({_ngrams_sql(3)}) AS sh
        FROM toks WHERE len(tokens) >= 3
    ), ex AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM tri
    ), train AS (
        SELECT shingle FROM ex WHERE doc_id % 10 <> 0
        GROUP BY shingle HAVING count(*) <= {TRIGRAM_DF_CAP}
    ), ev AS (
        SELECT doc_id, n_sh, shingle FROM ex WHERE doc_id % 10 = 0
    )
    SELECT ev.doc_id, CAST(min(ev.n_sh) AS INTEGER) AS n_shingles,
           CAST(count(t.shingle) AS INTEGER) AS n_contaminated
    FROM ev LEFT JOIN train t USING (shingle)
    GROUP BY ev.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: for every eval document (held-out
    split = doc_id % 10 == 0), count how many of its distinct word
    trigrams also occur in the train split with document frequency <=
    ``TRIGRAM_DF_CAP``.  The df cap (one HAVING on the index-building
    aggregation — it subsumes the DISTINCT) drops boilerplate trigrams
    that would otherwise (a) count every eval doc as "contaminated" by
    phrases like "one of the" and (b) concentrate the join's shuffle on
    a handful of hot keys at crawl scale.  The canonical shape at
    100 TB: explode distinct shingles, build the train shingle index
    once, one shuffle join on the shingle key (neither side is
    broadcastable), aggregate back per eval doc."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    tri = toks.where(F.size("tokens") >= 3).select(
        "doc_id", F.array_distinct(_ngrams(F.col("tokens"), 3)).alias("sh")
    )
    ex = tri.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    ).persist()  # barrier: train index + eval probe must not re-run the n-gram pipeline
    train = (
        ex.where(F.col("doc_id") % 10 != 0)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))  # rows are per-doc distinct
        .where(F.col("__df") <= TRIGRAM_DF_CAP)
        .select("shingle")
        .withColumn("__hit", F.lit(1))
    )
    ev = ex.where(F.col("doc_id") % 10 == 0)
    out = (
        ev.join(train, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.min("n_sh").cast("int").alias("n_shingles"),
            F.count("__hit").cast("int").alias("n_contaminated"),
        )
    )
    return out


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({{pairs}}),
    sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(src, node) AS (
        SELECT DISTINCT a, a FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a
    )
    SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clustering: MinHash-LSH candidate pairs
    (same pipeline as ``dedup_minhash_lsh``) become an undirected graph;
    connected components assign every near-duplicate document a cluster
    id (= min doc_id in its cluster), so "keep one per cluster" is a
    single argmin — the step pairwise dedup alone cannot express when
    A~B, B~C but A!~C.  Oracle is a recursive-CTE min-reachable-node
    computation over the identical pair set."""
    from tcdb_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


# The dedup_clusters oracle embeds the dedup_minhash_lsh oracle verbatim
# so the two queries can never drift apart.
ORACLES["dedup_clusters"] = ORACLES["dedup_clusters"].format(
    pairs=ORACLES["dedup_minhash_lsh"]
)


@register(
    "lm_bigram_nll",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    bigr AS (
        SELECT doc_id, unnest({_ngrams_sql(2)}) AS bg
        FROM toks WHERE len(tokens) >= 2
    ),
    ucnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(tokens) AS w FROM toks) GROUP BY w
    ),
    bcnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bigr GROUP BY bg),
    v AS (SELECT count(*) AS vocab FROM ucnt)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(ln((c2 + 1.0) / (c1 + (SELECT vocab FROM v)))), 4) AS nll
    FROM bigr
        JOIN bcnt USING (bg)
        JOIN ucnt ON w = split_part(bg, ' ', 1)
    GROUP BY doc_id
    """,
)
def lm_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filtering with a corpus-trained bigram
    LM (the KenLM-filter stand-in every pretraining pipeline runs —
    CCNet/RefinedWeb style): train add-one-smoothed bigram counts over
    the corpus itself, score each document by mean negative log
    likelihood; high-NLL docs are the gibberish/boilerplate outliers a
    percentile cut then drops (compose with quality_percentile_cut).

    Plan: ONE tokenization pass feeds bigram extraction (array slice
    zip — no per-doc window sort), two count shuffles build the model,
    the model dictionaries broadcast back onto the bigram stream, one
    groupBy(doc) scores. At 100 TB the dictionaries are the only state:
    if vocab outgrows broadcast, the joins fall back to shuffle-on-token
    and nothing else changes."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    bigr = toks.where(F.size("tokens") >= 2).select(
        "doc_id", F.explode(_ngrams(F.col("tokens"), 2)).alias("bg")
    )
    uni = toks.select(F.explode("tokens").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    bcnt = bigr.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    vocab = ucnt.count()
    scored = (
        bigr.join(F.broadcast(bcnt), on="bg")
        .join(
            F.broadcast(ucnt),
            F.col("w") == F.split(F.col("bg"), " ").getItem(0),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(vocab)))), 4
            ).alias("nll"),
        )
    )
    return scored


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tok AS (SELECT doc_id, lang, unnest(tokens) AS w FROM toks),
    rcnt AS (SELECT w, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY w),
    tcnt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct FROM tok WHERE lang = 'en' GROUP BY w),
    tot AS (
        SELECT (SELECT sum(cr) FROM rcnt) AS tr,
               (SELECT coalesce(sum(ct), 0) FROM tcnt) AS tt,
               (SELECT count(*) FROM rcnt) AS v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln((coalesce(ct, 0) + 1.0) / (tt + v))
                     - ln((cr + 1.0) / (tr + v))), 4) AS dsir_logweight
    FROM tok
        JOIN rcnt USING (w)
        LEFT JOIN tcnt USING (w)
        CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection via importance resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how target-like it
    is under two smoothed unigram LMs — log p_target(doc) - log
    p_raw(doc), with the English subset standing in as the target
    distribution. Downstream, sampling proportional to exp(weight)
    selects pretraining data matching the target domain.

    Plan: one tokenization explode feeds both count passes (target
    counts are a filtered re-aggregation, not a second scan), the two
    dictionaries broadcast, per-doc weights come from one groupBy.
    Unseen-in-target tokens take the smoothing floor via left join +
    coalesce."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    tok = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", "lang", F.explode(_tokens(F.col("text"))).alias("w")
    )
    rcnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cr"))
    tcnt = tok.where(F.col("lang") == "en").groupBy("w").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = rcnt.agg(
        F.sum("cr").alias("tr"), F.count(F.lit(1)).alias("v")
    ).first()
    tt = tcnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt")).first()["tt"]
    tr, v = totals["tr"], totals["v"]
    return (
        tok.join(F.broadcast(rcnt), on="w")
        .join(F.broadcast(tcnt), on="w", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / F.lit(float(tt + v)))
                    - F.log((F.col("cr") + 1.0) / F.lit(float(tr + v)))
                ),
                4,
            ).alias("dsir_logweight"),
        )
    )
