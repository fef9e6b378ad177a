"""Additional analytics catalog entries: sessionization, exact
percentiles, vocabulary building, salted aggregation equivalence —
rounding out §2.5/§2.7 plus training-pipeline text stats (§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.skew import salted_sum_count, sessionize
from tcdb_spark.plans.catalog import load_tables, register


@register(
    "sessionize_events",
    oracle="""
    WITH lagged AS (
        SELECT user_id, event_id, ts,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        FROM events
    )
    SELECT user_id, event_id, ts,
           CAST(sum(CASE WHEN coalesce(gap_s, 0) > 1800 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM lagged
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min), lag + conditional running sum —
    the batch twin of streaming session_window."""
    e = load_tables(spark, sf_dir, "events")["events"]
    out = sessionize(e, ["user_id"], "ts", gap_minutes=30.0, tiebreak="event_id")
    return out.select("user_id", "event_id", "ts", F.col("session_id").cast("bigint").alias("session_id"))


@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation definition).
    At 100 TB the approximate twin is percentile_approx with a bounded
    sketch — exact is the oracle-able correctness baseline."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "text_vocab_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS token
        FROM documents WHERE length(trim(text)) > 0
    ), df AS (
        SELECT token, CAST(count(*) AS BIGINT) AS doc_freq FROM toks GROUP BY token
    )
    SELECT token, doc_freq,
           CAST(row_number() OVER (ORDER BY doc_freq DESC, token ASC) AS INTEGER) AS rank
    FROM df
    QUALIFY rank <= 20
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document frequencies, top-20 — the
    dictionary-building pass of a text pipeline (map-side distinct
    explode + one count shuffle).  The top-k is TakeOrderedAndProject
    (per-partition heaps, 20 rows to the driver) and the rank window
    runs only over the 20 survivors — never a single-reducer sort of
    the full vocabulary, which is 10^7-10^8 tokens at web-corpus scale
    (same pattern as queries_ranking.rank_leg)."""
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    order = [F.col("doc_freq").desc(), F.col("token").asc()]
    return (
        freq.orderBy(*order)
        .limit(20)
        .withColumn("rank", F.row_number().over(W.orderBy(*order)).cast("int"))
    )


@register(
    "agg_salted_equivalence",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS sum_value, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    """,
)
def agg_salted_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation must equal the plain groupBy the
    oracle runs — the skew-mitigation path verified for correctness."""
    e = load_tables(spark, sf_dir, "events")["events"]
    out = salted_sum_count(e, ["user_id"], "value", n_salts=8)
    return out.select("user_id", F.round("sum_value", 2).alias("sum_value"), "n")


@register(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ), tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, token
    ), df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY token
    ), n AS (SELECT count(*) AS n_docs FROM documents WHERE length(trim(text)) > 0)
    SELECT doc_id, token,
           round(tf * ln((SELECT n_docs FROM n) / CAST(df AS DOUBLE)), 6) AS tfidf,
           CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY tf * ln((SELECT n_docs FROM n) / CAST(df AS DOUBLE)) DESC,
                        token ASC) AS INTEGER) AS rank
    FROM tf JOIN df USING (token)
    QUALIFY rank <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document: term-frequency groupBy +
    broadcast document-frequency dim + window top-k — the text-pipeline
    relevance-scoring pass, fully codegen'd (no HOFs)."""
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    docs = d.where(F.length(F.trim(F.col("text"))) > 0)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(dfreq), on="token").withColumn(
        "tfidf_raw", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", F.round("tfidf_raw", 6).alias("tfidf"), "rank")
    )


@register(
    "grouped_map_zscore",
    oracle="""
    WITH stats AS (
        SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n > 1 AND s.sigma > 0
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (grouped-map Pandas UDF,
    SURVEY.md §2.11 surface) — checked against the pure-SQL z-score. The
    built-in-function twin would be a window avg/stddev; the grouped-map
    path exists for logic pandas expresses and SQL can't."""
    import pandas as pd

    e = load_tables(spark, sf_dir, "events")["events"].select("event_id", "user_id", "value")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=[])
        sigma = pdf["value"].std(ddof=1)
        if not sigma > 0:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=[])
        z = (pdf["value"] - pdf["value"].mean()) / sigma
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z.round(4)}
        )

    return e.groupBy("user_id").applyInPandas(
        normalize, schema="event_id long, user_id long, zscore double"
    )


@register(
    "window_zscore",
    oracle="""
    WITH stats AS (
        SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n > 1 AND s.sigma > 0
    """,
)
def window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in twin of grouped_map_zscore and the RECOMMENDED plan:
    avg/stddev_samp over an unordered per-user window, pure column
    expressions end-to-end — one shuffle on user_id, whole-stage codegen,
    no Python serialization.  grouped_map_zscore stays catalogued as the
    §2.11 applyInPandas surface demo; use this shape whenever the
    per-group logic is expressible with built-ins."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"].select("event_id", "user_id", "value")
    w = W.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    n = F.count(F.lit(1)).over(w)
    return (
        e.withColumn("__mu", mu)
        .withColumn("__sigma", sigma)
        .withColumn("__n", n)
        .where((F.col("__n") > 1) & (F.col("__sigma") > 0))
        .select(
            "event_id",
            "user_id",
            F.round((F.col("value") - F.col("__mu")) / F.col("__sigma"), 4).alias("zscore"),
        )
    )


@register(
    "rollup_incremental",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           round(sum(value) / count(*), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained aggregate table: the fact stream arrives
    as 3 batches, each partial-aggregated and merged into the rollup
    state (count/sum/min/max are distributive, so N-batch maintenance is
    associative) — the oracle recomputes from scratch, proving
    incremental == full recompute. This is how an aggregate stays fresh
    at 100 TB: per tick you shuffle batch-sized partials, not history."""
    from tcdb_spark.operators.aggregates import rollup_merge, rollup_partial

    e = load_tables(spark, sf_dir, "events")["events"]
    batches = [e.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    state = rollup_partial(batches[0], ["event_type"], "value")
    for b in batches[1:]:
        state = rollup_merge(state, rollup_partial(b, ["event_type"], "value"), ["event_type"])
    return state.select(
        "event_type",
        "n",
        F.round("sum_v", 2).alias("sum_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
        F.round(F.col("sum_v") / F.col("n"), 4).alias("avg_value"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx
        FROM events
    ), firsts AS (
        SELECT user_id, min(week_idx) AS cohort_week FROM weekly GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(w.week_idx - f.cohort_week AS INTEGER) AS weeks_since,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM weekly w JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in every later week they return — the activation/retention triangle
    every product-analytics stack computes.  Week index is integer
    epoch arithmetic (no date_trunc: engines disagree on week start),
    first-week via a min over a per-user window (one shuffle reused by
    the cohort join), distinct-user counts per (cohort, offset)."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"]
    weekly = e.select(
        "user_id", F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("week_idx")
    ).distinct()
    cohort = F.min("week_idx").over(W.partitionBy("user_id"))
    return (
        weekly.withColumn("cohort_week", cohort)
        .groupBy("cohort_week", (F.col("week_idx") - F.col("cohort_week")).cast("int").alias("weeks_since"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "salted_join_equivalence",
    oracle="""
    SELECT o_orderkey, o_custkey AS c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def salted_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED fact-dim join must equal the plain join the oracle runs —
    the manual skew-mitigation path (hot fact keys spread over n_salts
    shuffle partitions, dim replicated per salt) verified for
    correctness. Companion to agg_salted_equivalence; see
    operators/skew.py salted_join for when to prefer this over AQE's
    post-shuffle skew splitting."""
    from tcdb_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, "orders", "customer")
    fact = t["orders"].select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    dim = t["customer"].select("c_custkey", "c_mktsegment")
    out = salted_join(fact, dim, "c_custkey", n_salts=8)
    return out.select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, k_decile
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a semi-structured JSON column: extract the
    typed field with ``from_json`` (one Jackson parse per row inside
    codegen — NOT a Python UDF, and not ``get_json_object`` repeated
    per field, which re-parses the document once per extraction), then
    aggregate on the derived key. At 100 TB the parse is the dominant
    cost and scales linearly with the scan; the only shuffle is the
    final small-cardinality groupBy. Value sums follow the DECIMAL
    contract (DEVNOTES #23)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        e.withColumn("k_decile", F.floor(k / 10))
        .groupBy("event_type", "k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup are sugar
    for): detail, per-status subtotal, and grand total in ONE pass —
    Spark expands the sets into a single Expand + hash aggregate, so
    the fact is scanned once instead of once per report level.
    grouping() bits disambiguate a genuine NULL key from a subtotal
    row (the classic grouping-sets trap); gid = 2*g(status) +
    g(priority) matches both engines bit-for-bit."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    gid = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast("long")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "variant_shred_props",
    oracle="""
    WITH shred AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM shred GROUP BY event_type
    """,
)
def variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the open VARIANT type (Spark
    4): ``parse_json`` builds the binary-shredded value ONCE per row,
    ``try_variant_get`` extracts typed paths without re-parsing — the
    modern lakehouse answer to schema-drifting JSON columns, and unlike
    ``from_json`` it needs no up-front schema, so producers can add
    fields without breaking the pipeline.  At 100 TB the binary
    encoding also shreds into parquet columns (variant shredding), so
    typed-path reads prune like real columns.  ``try_`` semantics map
    malformed documents to NULL instead of failing the scan — counted
    here via n_with_k vs n."""
    e = load_tables(spark, sf_dir, "events")["events"]
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@register(
    "approx_quantile_hist",
    oracle="""
    WITH bins AS (
        SELECT source,
               CAST(least(63, greatest(0, CAST(floor(n_chars / 10.0) AS BIGINT)))
                    AS INTEGER) AS bin,
               count(*) AS cnt
        FROM documents GROUP BY 1, 2
    ), cum AS (
        SELECT source, bin, cnt,
               sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY source) AS total
        FROM bins
    ), qv AS (
        SELECT CAST(0.5 AS DOUBLE) AS q UNION ALL SELECT CAST(0.9 AS DOUBLE)
    ), hit AS (
        SELECT c.source, qv.q, c.bin, c.cnt, c.cum, c.total,
               row_number() OVER (PARTITION BY c.source, qv.q ORDER BY c.bin) AS rn
        FROM cum c JOIN qv ON c.cum >= ceil(qv.q * c.total)
    )
    SELECT source, q,
           round((bin + (ceil(q * total) - (cum - cnt)) * 1.0 / cnt) * 10.0, 4) AS est
    FROM hit WHERE rn = 1
    """,
)
def approx_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantiles (`operators/sketch.py
    hist_partials`/`hist_quantile`): p50/p90 of document length per
    source from a 64-bin equi-width summary.  The partials are a SUM
    under merge — the same contract as the HLL and Misra-Gries state,
    so shards/days combine without touching raw data; error is bounded
    by one bin width (test-gated vs exact percentile).  Unlike
    approx_percentile's randomized sketch, fixed binning is
    deterministic, which is what makes a cross-engine value-exact
    oracle possible for an *approximate* operator.
    """
    from tcdb_spark.operators.sketch import hist_partials, hist_quantile

    d = load_tables(spark, sf_dir, "documents")["documents"]
    parts = hist_partials(d, "n_chars", ["source"], lo=0.0, hi=640.0, n_bins=64)
    return hist_quantile(parts, ["source"], [0.5, 0.9], lo=0.0, hi=640.0, n_bins=64)


@register(
    "grouped_arrow_ols",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope("value", epoch(ts) / 86400.0), 9) AS slope,
           round(regr_intercept("value", epoch(ts) / 86400.0), 5) AS intercept
    FROM events
    GROUP BY user_id
    """,
)
def grouped_arrow_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend fit via ``groupBy().applyInArrow`` — the
    grouped Arrow-native lane (SURVEY.md §2.11), completing the Python
    surface matrix (mapInPandas, mapInArrow, grouped/cogrouped
    applyInPandas, UDTF, pandas_udf).  The group arrives as a
    ``pyarrow.Table``; numpy computes the closed-form slope/intercept
    of value over time directly on the Arrow buffers (zero-copy for
    numeric columns — no pandas object boxing).  The DuckDB oracle is
    the built-in ``regr_slope``/``regr_intercept`` pair, and Spark's
    own ``regr_slope``/``regr_intercept`` aggregates are the
    recommended production plan (codegen, partial-aggregated) — as
    with grouped_map_zscore, the Arrow lane exists for per-group logic
    built-ins cannot express.  Zero-variance groups yield NULL in both
    engines; slopes are per-day and computed in centered form on both
    sides, so rounding (1e-9 slope / 1e-5 intercept) sits well above
    the cross-engine summation noise.
    """
    import numpy as np
    import pyarrow as pa

    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "user_id", "ts", "value"
    )

    def fit(table: pa.Table) -> pa.Table:
        uid = table.column("user_id")[0].as_py()
        x = np.asarray(
            table.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        ) / (86400.0 * 1_000_000.0)  # timestamp us -> days
        y = table.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(y)
        # regr_* semantics: NULL pairs (NaN after Arrow->numpy) are
        # excluded from the fit but count(*) still counts them
        # (shadow-sweep finding: all-null and partly-null groups exist)
        mask = ~(np.isnan(x) | np.isnan(y))
        x, y = x[mask], y[mask]
        # centered form: the raw normal equations (n*Sxx - Sx^2) cancel
        # catastrophically when x is epoch days (~2e4) — ~10 digits lost,
        # measured as 1e-9 slope disagreement vs DuckDB's stable regr_*
        if len(x) == 0:
            slope, intercept = None, None
        else:
            xc = x - x.mean()
            yc = y - y.mean()
            den = float((xc * xc).sum())
            if den == 0.0:
                slope, intercept = None, None
            else:
                slope = float((xc * yc).sum()) / den
                intercept = float(y.mean() - slope * x.mean())
                slope = round(slope, 9)
                intercept = round(intercept, 5)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "slope": pa.array([slope], pa.float64()),
                "intercept": pa.array([intercept], pa.float64()),
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        fit, schema="user_id long, n long, slope double, intercept double"
    )


# --- distribution-drift monitoring (PSI) -----------------------------------

_PSI_BINS = 16
_PSI_EPS = 0.5  # Laplace smoothing per bin (zero-proof, exact rational)

_PSI_BIN_SQL = (
    f"CAST(least(floor((value - mn) / (greatest(mx - mn, 1e-300) / {_PSI_BINS})), "
    f"{_PSI_BINS - 1}) AS INTEGER)"
)

_psi_cohort_counts = ", ".join(
    f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS DOUBLE) AS c{i}"
    for i in range(_PSI_BINS)
)
_psi_terms = "\n         + ".join(
    f"((q{i} - p{i}) * ln(q{i} / p{i}))" for i in range(_PSI_BINS)
)
_psi_q = ", ".join(
    f"(g.c{i} + {_PSI_EPS}) / (g.n + {_PSI_BINS * _PSI_EPS}) AS q{i}"
    for i in range(_PSI_BINS)
)
# Leave-one-out baseline: the reference distribution for a cohort is the
# pool MINUS that cohort (t.cI - g.cI), so a drifted cohort cannot dilute
# its own reference.  With a single cohort the baseline degenerates to the
# smoothed uniform 1/bins — deterministic, PSI finite.
_psi_p = ", ".join(
    f"(t.c{i} - g.c{i} + {_PSI_EPS}) / (t.n - g.n + {_PSI_BINS * _PSI_EPS}) AS p{i}"
    for i in range(_PSI_BINS)
)

_PSI_ORACLE = f"""
    WITH rng AS (
        SELECT min(value) AS mn, max(value) AS mx FROM events
    ), binned AS (
        SELECT event_type, {_PSI_BIN_SQL} AS bin
        FROM events CROSS JOIN rng
    ), grp AS (
        SELECT event_type, {_psi_cohort_counts},
               CAST(count(*) AS DOUBLE) AS n
        FROM binned GROUP BY event_type
    ), tot AS (
        SELECT {_psi_cohort_counts}, CAST(count(*) AS DOUBLE) AS n FROM binned
    ), probs AS (
        SELECT g.event_type, {_psi_q}, {_psi_p}
        FROM grp g CROSS JOIN tot t
    )
    SELECT event_type,
           round({_psi_terms}, 6) AS psi
    FROM probs
    """


def psi_by_cohort(
    df: DataFrame,
    cohort_col: str,
    value_col: str,
    bins: int = _PSI_BINS,
    eps: float = _PSI_EPS,
) -> DataFrame:
    """Reusable PSI operator: one row per cohort with the Population
    Stability Index of its ``value_col`` distribution vs the pool MINUS
    the cohort itself (leave-one-out baseline).  A pooled baseline would
    let a drifted cohort contaminate its own reference — with two
    equal-size cohorts both would get the identical PSI by symmetry and
    "identical to the rest of the pool -> PSI ~ 0" would be
    unsatisfiable.  Here a cohort that matches everything else scores
    ~0 and a shifted one scores high, as a drift monitor must.  The bin
    width is guarded against a constant value column (greatest with a
    tiny positive width: all rows land in bin 0, PSI 0 — Spark's
    non-ANSI NULL-on-div-0 and DuckDB's IEEE semantics would otherwise
    disagree).  See ``psi_drift`` for the exactness/scale contract
    (integer bin counts, fixed-order smoothed sum)."""
    rng = df.agg(F.min(value_col).alias("mn"), F.max(value_col).alias("mx"))
    width = F.greatest(F.col("mx") - F.col("mn"), F.lit(1e-300)) / bins
    binned = df.crossJoin(F.broadcast(rng)).select(
        cohort_col,
        F.least(
            F.floor((F.col(value_col) - F.col("mn")) / width),
            F.lit(bins - 1),
        ).cast("int").alias("bin"),
    )
    counts = [  # one F.expr per column: ~6x fewer py4j calls than
        F.expr(  # composing when/sum/cast Column objects (see below)
            f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS DOUBLE)"
        ).alias(f"c{i}")
        for i in range(bins)
    ]
    grp = binned.groupBy(cohort_col).agg(
        *counts, F.expr("CAST(count(1) AS DOUBLE)").alias("n")
    )
    # psi_from_counts reads grp twice (pool totals = its column sums);
    # no persist needed — the count matrix's shuffle is a ReusedExchange
    # in the final plan (verified), so the corpus-sized work still runs
    # once and nothing leaks into the cache across calls
    return psi_from_counts(grp, cohort_col, bins=bins, eps=eps)


def psi_from_counts(
    grp: DataFrame,
    cohort_col: str,
    bins: int = _PSI_BINS,
    eps: float = _PSI_EPS,
) -> DataFrame:
    """Leave-one-out PSI from a per-cohort count matrix (columns
    ``c0..c{bins-1}`` + row count ``n``) — the mergeable-state half of
    the monitor: counts SUM across shards/batches/days, so the same
    expression serves the one-shot batch query and the streaming state
    fold (streaming/pipeline.stream_psi_drift)."""
    tot = grp.agg(
        *[F.sum(f"c{i}").alias(f"t{i}") for i in range(bins)],
        F.sum("n").alias("tn"),
    )
    probs = grp.crossJoin(F.broadcast(tot))
    # The 16-term fixed-order sum is built as ONE SQL string: assembling
    # it from ~500 Column objects costs ~1 s of py4j round-trips PER
    # CALL (measured — it dominated the lane's bench time), while one
    # F.expr parses server-side into the identical left-associative AST,
    # so the float summation order (and the oracle hash) is unchanged.
    q = [f"((c{i} + {eps}) / (n + {bins * eps}))" for i in range(bins)]
    p = [  # leave-one-out: pool counts minus this cohort's counts
        f"((t{i} - c{i} + {eps}) / (tn - n + {bins * eps}))" for i in range(bins)
    ]
    terms = " + ".join(
        f"(({q[i]} - {p[i]}) * ln({q[i]} / {p[i]}))" for i in range(bins)
    )
    return probs.select(cohort_col, F.expr(terms).alias("psi"))


@register("psi_drift", oracle=_PSI_ORACLE)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each event type's ``value``
    distribution against the rest of the corpus (leave-one-out
    baseline: pool minus the cohort) — the standard drift monitor
    a training-data pipeline runs between ingestion cohorts (PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 action). Generalizes the
    reference's freshness checks from "is new data arriving" to "does
    the new data still look like the old data".

    Exact cross-engine math by construction: binning is one global
    (min, max) broadcast + identical float arithmetic per row; per-bin
    counts are INTEGER aggregates (unordered sums are exact); the PSI
    itself is a FIXED-ORDER 16-term expression over Laplace-smoothed
    (+0.5) frequencies, so no unordered float summation exists anywhere.
    One scan + one shuffle (the per-type count aggregate); the 16-column
    count matrix is ~n_types rows regardless of corpus size."""
    e = load_tables(spark, sf_dir, "events")["events"]
    out = psi_by_cohort(e, "event_type", "value")
    return out.select("event_type", F.round("psi", 6).alias("psi"))


@register(
    "approx_distinct_audit",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-count audit: per-(type, day)
    sketches unioned up to per-type estimates, attested against the
    exact distinct counts within a 5% bound.

    This is the pre-aggregated-cube pattern that makes distinct counts
    tractable at 100 TB: ``hll_sketch_agg`` partials are built map-side
    (fixed ~KB of memory per group, Apache DataSketches HLL built into
    Spark 3.5+), persisted at fine grain (here daily), and re-rolled to
    any coarser grain with ``hll_union_agg`` WITHOUT rescanning the
    fact table — exact COUNT(DISTINCT) cannot re-aggregate (distinct
    sets don't add) and must reshuffle every raw key each time.  The
    catalog row attests the estimate lands within 5% of truth (boolean
    column, hash-compared against the oracle's literal TRUE), so a
    sketch-accuracy regression reds the gate.  At 150-user test scale
    the HLL sparse mode is near-exact; the bound is the production
    contract (default lgConfigK=12 -> ~1.6% RSE)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_5pct"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    c AS (SELECT event_type AS src_type, nxt AS dst_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT src_type, dst_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src_type), 6) AS p
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types — the
    behavioral-modeling summary (next-action prediction, bot detection,
    funnel leak localization) of the event stream.

    One per-user window pass pairs each event with its successor (the
    sequence key is the shuffle key, same shape as acf_lags), one
    aggregate collapses to |types|^2 cells, and the row-normalization
    window runs over that tiny matrix partitioned by source type —
    never over raw events.  Deterministic sequence order (ts, event_id)
    so cross-engine successor pairs are identical."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    c = s.groupBy("src_type", "dst_type").agg(F.count("*").alias("n"))
    wn = W.partitionBy("src_type")
    return c.select(
        "src_type",
        "dst_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"),
    )


@register(
    "user_streaks",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        FROM events
    ),
    g AS (SELECT user_id, d,
                 d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
          FROM pairs),
    runs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
             FROM g GROUP BY user_id, grp)
    SELECT user_id, max(len) AS max_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands idiom (d - row_number() is constant within a run
    of consecutive days) that powers engagement/retention scoring.

    Two shuffles, both on user_id and REUSED: the distinct day pairs,
    the per-user window, and the run-length aggregates all hash on the
    same key, so Catalyst collapses them into one exchange.  Day index
    is integer epoch arithmetic (engines disagree on date_trunc week
    starts; days are unambiguous in a UTC session)."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"]
    pairs = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    g = pairs.withColumn("grp", F.col("d") - F.row_number().over(w))
    runs = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").alias("max_streak"), F.count("*").alias("n_streaks")
    )


@register(
    "sliding_distinct_hll",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM pairs),
    cov AS (SELECT p.user_id, p.d + o.off AS cd
            FROM pairs p, (SELECT unnest(range(0, 7)) AS off) o)
    SELECT days.d AS d,
           CAST(count(DISTINCT cov.user_id) AS BIGINT) AS exact_users_7d,
           TRUE AS within_5pct
    FROM cov JOIN days ON cov.cd = days.d
    GROUP BY days.d
    """,
)
def sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, computed BOTH ways and
    attested: mergeable HLL sketches unioned over a RANGE window (the
    production path — daily sketches are built once and every trailing
    window reuses them) versus the exact explode-to-covered-days
    rollup.  Exact sliding distinct at 100 TB either re-shuffles every
    raw (user, day) pair per window (explode path: 7x the distinct
    pairs, still exact — what the oracle and the attestation side do)
    or dies; the sketch path unions ~KB registers per day and is the
    only shape that survives arbitrary window widths.  The day-ordered
    union window is global but its input is ONE ROW PER CALENDAR DAY —
    physically bounded, allowlisted in plan lint with that argument.
    The catalog row hash-checks the exact side and attests the sketch
    lands within 5% (boolean vs the oracle's literal TRUE)."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"]
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    pairs = e.select("user_id", day.alias("d")).distinct().persist()
    daily = pairs.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = W.orderBy("d").rangeBetween(-6, 0)
    est = daily.select(
        "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est")
    )
    cov = pairs.select("user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("cd"))
    days = pairs.select("d").distinct()
    exact = (
        cov.join(days, cov.cd == days.d)
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("exact_users_7d"))
    )
    return exact.join(est, "d").select(
        "d",
        "exact_users_7d",
        (
            F.abs(F.col("est") - F.col("exact_users_7d"))
            <= F.lit(0.05) * F.col("exact_users_7d")
        ).alias("within_5pct"),
    )


@register(
    "market_basket_lift",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM ob),
    bc AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY b),
    pairs AS (
        SELECT a.b AS brand_a, c.b AS brand_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
        GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b, p.n_ab,
           round((CAST(p.n_ab AS DOUBLE) * (SELECT n_orders FROM n))
                 / (ba.n_b * bb.n_b), 6) AS lift
    FROM pairs p
    JOIN bc ba ON ba.b = p.brand_a
    JOIN bc bb ON bb.b = p.brand_b
    WHERE p.n_ab >= 10
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: brand-pair support and lift
    over order baskets (lift = P(ab) / P(a)P(b), the association signal
    behind co-purchase recommenders and — on corpora — tag/domain
    co-occurrence analysis).

    Scale shape: the fact table joins the brand dimension by BROADCAST
    (the fact side never shuffles for the enrich), collapses to
    distinct (order, brand) — baskets bound the pair stage: the
    self-join on the order key emits C(basket_size, 2) pairs per order,
    never a global cross.  Oversized hot baskets (a crawl page linking
    everything) take the df-cap treatment first
    (operators/textdedup.drop_hot_keys — same device as the shingle
    index).  Per-brand marginals re-enter as a 25-row broadcast and the
    order total as a 1-row literal join, so lift is computed without
    re-scanning the fact.  Min-support 10 prunes the noise floor before
    output.  Lift numerator/denominator are exact integers promoted to
    double once — the round(6) only absorbs the division ULP."""
    from tcdb_spark.operators.aggregates import basket_pair_lift

    t = load_tables(spark, sf_dir, "lineitem", "part")
    ob = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), t["lineitem"].l_partkey == t["part"].p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    out = basket_pair_lift(ob, min_support=10)
    return out.select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "n_ab",
        "lift",
    )
