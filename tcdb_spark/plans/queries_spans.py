"""Span-level dedup, sketch-pruned heavy hitters, per-domain caps, and
split-drift measurement — the corpus-surgery layer of the curation
suite (SURVEY.md §2.12 extensions; no reference analog — the reference
corpus fits one MySQL box, these are the 100 TB-pipeline jobs).

Oracle discipline follows queries_corpus.py: integer counts wherever
possible, explicit rounding on the one float column (log-ratio), and
deterministic tiebreaks on every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import load_tables, register
from tcdb_spark.plans.queries_corpus import _TOKS_SQL, _tokens

SPAN_W = 10  # duplicated-span window width, tokens


def _win_sql(w: int) -> str:
    """DuckDB width-``w`` window text at 1-based start ``i`` over ``tokens``."""
    return " || ' ' || ".join(f"tokens[i+{k}]" for k in range(w))


# Shared span-pipeline CTE chain (tokens -> windows -> owners -> covered
# intervals -> merged islands); the three span oracles compose it so the
# SQL semantics can never drift between them.
def _span_cte_sql() -> str:
    return f"""toks AS ({_TOKS_SQL}),
    wins AS (
        SELECT doc_id, i AS start, {_win_sql(SPAN_W)} AS win
        FROM toks CROSS JOIN LATERAL
             (SELECT unnest(range(1, len(tokens) - {SPAN_W - 2})) AS i) t
        WHERE len(tokens) >= {SPAN_W}
    ),
    owners AS (
        SELECT win, min(doc_id) AS owner_doc, count(DISTINCT doc_id) AS ndocs
        FROM wins GROUP BY win
    ),
    covered AS (
        SELECT w.doc_id, w.start, w.start + {SPAN_W - 1} AS e
        FROM wins w JOIN owners o USING (win)
        WHERE o.ndocs > 1 AND w.doc_id <> o.owner_doc
    ),
    flagged AS (
        SELECT doc_id, start, e,
               CASE WHEN start > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM covered
    ),
    islands AS (
        SELECT doc_id, start, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY start
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ),
    merged_spans AS (
        SELECT doc_id,
               CAST(min(start) AS INTEGER) AS span_start,
               CAST(max(e) AS INTEGER) AS span_end,
               CAST(max(e) - min(start) + 1 AS INTEGER) AS span_len
        FROM islands GROUP BY doc_id, island
    )"""


_SPAN_SELECT_SQL = "SELECT doc_id, span_start, span_end, span_len FROM merged_spans"


@register(
    "span_dedup",
    oracle=f"WITH {_span_cte_sql()}\n    {_SPAN_SELECT_SQL}",
)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN dedup (Lee et al. 2022 substring dedup,
    window-hash approximation): maximal token spans that also occur in
    another (lower-doc_id) document.  Doc-level dedup cannot see these —
    a license block inside an otherwise unique page survives MinHash.
    See operators/spans.py for the two-shuffle plan and the 100 TB
    shape; the DuckDB oracle recomputes spans from the window TEXT
    (vs Spark's 8-byte xxhash64 keys), so a hash collision would show
    up here as a mismatch."""
    from tcdb_spark.operators.spans import duplicated_spans

    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    return duplicated_spans(toks.where(F.size("tokens") >= SPAN_W), w=SPAN_W)


@register(
    "span_dedup_incremental",
    # identical oracle to span_dedup ON PURPOSE: per-batch incremental
    # spans must union to exactly the one-shot corpus answer, so the
    # driver's hash compare IS the incremental==recompute proof.
    oracle=f"WITH {_span_cte_sql()}\n    {_SPAN_SELECT_SQL}",
)
def span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span dedup as the driver sees it: the corpus is
    split into two ingest batches on the doc_id median; batch 1 is
    one-shot deduped and indexed (window-hash -> owner), batch 2 is
    windowed ONCE and probed against the index (operators/spans.py
    incremental_duplicated_spans).  The emitted union must hash-equal
    the one-shot oracle over the full corpus — daily ingest never
    re-processes the lake, and loses nothing by not doing so."""
    from tcdb_spark.operators.spans import (
        duplicated_spans,
        incremental_duplicated_spans,
        span_index,
    )

    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    ).where(F.size("tokens") >= SPAN_W)
    median = toks.approxQuantile("doc_id", [0.5], 0.0)[0]
    batch1 = toks.where(F.col("doc_id") <= median)
    batch2 = toks.where(F.col("doc_id") > median)
    spans1 = duplicated_spans(batch1, w=SPAN_W)
    idx = span_index(batch1, w=SPAN_W)
    spans2, _, _ = incremental_duplicated_spans(idx, batch2, w=SPAN_W)
    return spans1.unionByName(spans2)


HH_K = 1000  # report bigrams with count*HH_K >= corpus bigram total


@register(
    "heavy_hitters",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    bg AS (
        SELECT tokens[i] || ' ' || tokens[i+1] AS token
        FROM toks CROSS JOIN LATERAL
             (SELECT unnest(range(1, len(tokens))) AS i) t
        WHERE len(tokens) >= 2
    ),
    tot AS (SELECT count(*) AS n FROM bg)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM bg, tot GROUP BY token, n HAVING count(*) * {HH_K} >= n
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy-hitter bigrams (count >= N/{k}) via the
    Misra-Gries sketch-then-recount plan (operators/sketch.py): the
    sketch pass is shuffle-free, candidates are a guaranteed superset
    (mergeable-summary pigeonhole, capacity >= k), and the exact
    recount joins a broadcast candidate list — so the result is EXACT
    and oracle-checkable while the shuffle moves candidates, not the
    distinct-n-gram universe.  The naive plan shuffles every distinct
    bigram of a 100 TB corpus; this one shuffles partitions x capacity
    rows."""
    from tcdb_spark.operators.sketch import heavy_hitters_exact

    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        _tokens(F.col("text")).alias("tokens")
    )
    # when-guarded so the expression is total: InferFiltersFromGenerate
    # can hoist it past the size>=2 filter (see queries_corpus._ngrams)
    bg = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - 1),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("tokens"), i),
            F.element_at(F.col("tokens"), i + 1),
        ),
    )
    bigrams = toks.where(F.size("tokens") >= 2).select(
        F.explode(
            F.when(F.size("tokens") >= 2, bg).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("token")
    )
    return heavy_hitters_exact(bigrams, "token", k=HH_K)


DOMAIN_CAP = 20  # max documents kept per source domain


@register(
    "domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS INTEGER) AS rank_in_source
    FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {DOMAIN_CAP}
    """,
)
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb/FineWeb-style: no single
    host may dominate the corpus): keep the top {cap} docs per source
    by quality proxy (n_chars), deterministic doc_id tiebreak.  One
    window shuffle on source; at crawl scale source is the hot-key
    dimension, so a production run pre-aggregates per-host counts —
    but the keep-set itself is exactly this row_number cut."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rank_in_source"))
        .where(F.col("rank_in_source") <= DOMAIN_CAP)
        .select(
            "doc_id", "source", F.col("rank_in_source").cast("int").alias("rank_in_source")
        )
    )


@register(
    "unigram_drift",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    ex AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
    tr AS (SELECT token, count(*) AS c FROM ex WHERE doc_id % 10 <> 0 GROUP BY token),
    va AS (SELECT token, count(*) AS c FROM ex WHERE doc_id % 10 = 0 GROUP BY token),
    vocab AS (SELECT count(*) AS v FROM
              (SELECT token FROM tr UNION SELECT token FROM va)),
    tots AS (SELECT (SELECT sum(c) FROM tr) AS nt, (SELECT sum(c) FROM va) AS nv)
    SELECT coalesce(tr.token, va.token) AS token,
           CAST(coalesce(tr.c, 0) AS BIGINT) AS n_train,
           CAST(coalesce(va.c, 0) AS BIGINT) AS n_val,
           round(ln( ((coalesce(tr.c,0) + 1.0) / (nt + v))
                   / ((coalesce(va.c,0) + 1.0) / (nv + v)) ), 6) AS log_ratio
    FROM tr FULL OUTER JOIN va USING (token), vocab, tots
    """,
)
def unigram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-val token-distribution drift: per-token add-one-smoothed
    log probability ratio (the per-token term of KL(train||val)) over
    the same doc_id%10 split as contamination_check.  A curation QA
    gate — a token with |log_ratio| >> 0 marks a distribution skew the
    split introduced.  Plan: one explode, ONE conditional partial-agg
    count per token (the former two filtered groupBys + full-outer
    join re-merged the same token universe the single aggregate
    produces directly — r8 §15; the explode feeds one exchange, which
    the scalar branch reuses, so the persist went too), two 1-row
    scalar crosses (vocab size, totals).  Rounded to 6 dp on both
    engines (libm ULP divergence, DEVNOTES hazards)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    # pin the token universe to the oracle's (ADVICE r8): the DuckDB
    # tr/va CTEs' WHERE clauses exclude NULL doc_id rows, so a
    # null-doc_id token must not surface here as an n_train=0/n_val=0
    # row (it would inflate the vocab size v and shift every log_ratio)
    ex = toks.where(F.col("doc_id").isNotNull()).select(
        "doc_id", F.explode("tokens").alias("token")
    )
    joined = ex.groupBy("token").agg(
        F.sum(F.when(F.col("doc_id") % 10 != 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("doc_id") % 10 == 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_val"
        ),
    )
    scalars = joined.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("n_train").alias("nt"),
        F.sum("n_val").alias("nv"),
    )
    return joined.crossJoin(F.broadcast(scalars)).select(
        "token",
        "n_train",
        "n_val",
        F.round(
            F.log(
                ((F.col("n_train") + 1.0) / (F.col("nt") + F.col("v")))
                / ((F.col("n_val") + 1.0) / (F.col("nv") + F.col("v")))
            ),
            6,
        ).alias("log_ratio"),
    )


@register(
    "span_scrub",
    oracle=f"""
    WITH {_span_cte_sql()},
    sp AS (
        SELECT doc_id,
               list(struct_pack(s := span_start, e := span_end)) AS sl
        FROM merged_spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tokens) AS INTEGER) AS n_tokens,
           CAST(coalesce(len(sp.sl), 0) AS INTEGER) AS n_spans,
           CAST(len(t.tokens) - len(list_filter(
                list_transform(range(1, len(t.tokens) + 1),
                    i -> CASE WHEN len(list_filter(coalesce(sp.sl, []),
                                  x -> i >= x.s AND i <= x.e)) = 0
                         THEN t.tokens[i] ELSE NULL END),
                y -> y IS NOT NULL)) AS INTEGER) AS n_removed,
           coalesce(array_to_string(list_filter(
                list_transform(range(1, len(t.tokens) + 1),
                    i -> CASE WHEN len(list_filter(coalesce(sp.sl, []),
                                  x -> i >= x.s AND i <= x.e)) = 0
                         THEN t.tokens[i] ELSE NULL END),
                y -> y IS NOT NULL), ' '), '') AS clean_text
    FROM toks t LEFT JOIN sp USING (doc_id)
    """,
)
def span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surgical end of span dedup: REMOVE each duplicated span from
    its document and emit the cleaned text plus removal accounting —
    what the curation pipeline actually writes back (Lee et al. cut the
    duplicated substring, not the document).  Plan: spans collect to
    one small struct-array per doc (left join — docs without spans pass
    through), then a pure higher-order filter drops covered token
    positions; no token explode, no second shuffle beyond the span
    pipeline itself."""
    from tcdb_spark.operators.spans import duplicated_spans

    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _tokens(F.col("text")).alias("tokens")
    )
    spans = duplicated_spans(toks.where(F.size("tokens") >= SPAN_W), w=SPAN_W)
    sp = spans.groupBy("doc_id").agg(
        # consumed order-invariantly (exists/filter), but sorted anyway
        # so the plan is provably retry-deterministic (lint rule)
        F.array_sort(F.collect_list(F.struct(
            F.col("span_start").alias("s"), F.col("span_end").alias("e")
        ))).alias("sl")
    )
    joined = toks.join(sp, "doc_id", "left").withColumn(
        "sl", F.coalesce("sl", F.array().cast("array<struct<s:int,e:int>>"))
    )
    covered = lambda i: F.exists(  # noqa: E731 — 1-based token position i
        F.col("sl"), lambda x: (i >= x["s"]) & (i <= x["e"])
    )
    clean = F.filter(
        F.col("tokens"), lambda t, i0: ~covered(i0 + F.lit(1))
    )
    return joined.select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tokens"),
        F.size("sl").cast("int").alias("n_spans"),
        (F.size("tokens") - F.size(clean)).cast("int").alias("n_removed"),
        F.concat_ws(" ", clean).alias("clean_text"),
    )


TOKEN_BUDGET = 4000  # per-source token budget for the mixing run


@register(
    "token_budget_sample",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    sized AS (
        SELECT doc_id, source, CAST(len(tokens) AS BIGINT) AS n_tokens,
               sum(len(tokens)) OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM sized WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: per source, keep the best documents
    (quality proxy n_chars, deterministic doc_id tiebreak) until the
    running token total hits the budget — how pretraining mixes are
    actually specified (tokens per domain, not document counts).  One
    window cumsum per source; the greedy prefix rule makes the keep set
    a pure function of the ordering, so it is reproducible under any
    partitioning and exactly oracle-checkable."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", "source", "n_chars", _tokens(F.col("text")).alias("tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sized = toks.select(
        "doc_id",
        "source",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.sum(F.size("tokens").cast("long")).over(w).alias("cum_tokens"),
    )
    return sized.where(F.col("cum_tokens") <= TOKEN_BUDGET)


_DOMAIN_CAP_ORACLE = f"""
    SELECT doc_id, source, CAST(rk AS INTEGER) AS rank_in_source
    FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {DOMAIN_CAP}
    """


@register("domain_cap_skewsafe", oracle=_DOMAIN_CAP_ORACLE)
def domain_cap_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe twin of domain_cap: two-phase top-N (salted local
    prune, then exact global rank — operators/skew.py
    topn_per_key_two_phase).  A hot domain serializes the plain window
    into one straggler task at crawl scale; the two-phase plan bounds
    every key's final-phase input at n_salts*N rows.  Shares
    domain_cap's oracle verbatim — the driver hash compare IS the
    equivalence proof."""
    from tcdb_spark.operators.skew import topn_per_key_two_phase

    d = load_tables(spark, sf_dir, "documents")["documents"]
    out = topn_per_key_two_phase(
        d.select("doc_id", "source", "n_chars"),
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        n=DOMAIN_CAP,
    )
    return out.select(
        "doc_id", "source", F.col("rank_in_key").cast("int").alias("rank_in_source")
    )
