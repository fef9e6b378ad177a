"""Time-series regularization over the ``events`` stream: resample an
irregular per-key series onto a fixed grid — linear interpolation and
last-observation-carried-forward (LOCF).

This is the Spark-first generalization of the reference's ensemble-track
axis alignment (tcdb/etl/syntracks.py:110-127 builds a regular
valid-time axis and NaN-fills tracks onto it): instead of a per-object
xarray reindex, the whole corpus is regularized in one declarative plan
(window lead + generated integer grid + explode), which scales to any
number of keys with exactly one shuffle (the per-key window).

Cross-engine exactness (DEVNOTES.md): grid points are integer hour
indices derived with integer ceil-division from epoch microseconds (no
float rounding anywhere in grid placement), and the interpolated value
is the identical expression tree ``v1 + (v2 - v1) * (dt/DT)`` in both
engines — per-row IEEE arithmetic is bit-identical, so no rounding is
needed on the output either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import load_tables, register

_US_PER_H = 3_600_000_000


@register(
    "resample_interp_1h",
    oracle=f"""
    WITH dedup AS (
        SELECT user_id, ts, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), seg AS (
        SELECT user_id, ts, value,
               lead(ts) OVER w AS ts2, lead(value) OVER w AS v2
        FROM dedup WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        QUALIFY ts2 IS NOT NULL
    ), idx AS (
        SELECT user_id, ts, value, ts2, v2,
               (epoch_us(ts) + {_US_PER_H - 1}) // {_US_PER_H} AS i0,
               (epoch_us(ts2) - 1) // {_US_PER_H} AS i1
        FROM seg
    ), pts AS (
        SELECT user_id, ts, value, ts2, v2, unnest(range(i0, i1 + 1)) AS i
        FROM idx WHERE i0 <= i1
    )
    SELECT user_id,
           make_timestamp(i * {_US_PER_H}) AS grid_ts,
           value + (v2 - value)
                 * (CAST(i * {_US_PER_H} - epoch_us(ts) AS DOUBLE)
                    / CAST(epoch_us(ts2) - epoch_us(ts) AS DOUBLE)) AS val
    FROM pts
    """,
)
def resample_interp_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear interpolation of ``value`` onto an hourly grid:
    every grid hour strictly inside a consecutive-event segment gets
    ``v1 + (v2-v1) * dt/DT``.  One window shuffle on user_id; grid
    generation and interpolation are per-row codegen'd expressions, so
    the plan is identical at 100 TB with the shuffle partitioned by key."""
    e = load_tables(spark, sf_dir, "events")["events"]
    wd = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dedup = (
        e.withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", "value")
    )
    w = W.partitionBy("user_id").orderBy("ts")
    seg = (
        dedup.select(
            "user_id",
            "ts",
            "value",
            F.lead("ts").over(w).alias("ts2"),
            F.lead("value").over(w).alias("v2"),
        )
        .where(F.col("ts2").isNotNull())
        .withColumn("e1", F.unix_micros("ts"))
        .withColumn("e2", F.unix_micros("ts2"))
        .withColumn("i0", F.expr(f"(e1 + {_US_PER_H - 1}) div {_US_PER_H}"))
        .withColumn("i1", F.expr(f"(e2 - 1) div {_US_PER_H}"))
        .where(F.col("i0") <= F.col("i1"))  # Spark sequence reverses when i0 > i1
    )
    pts = seg.select(
        "user_id",
        "value",
        "v2",
        "e1",
        "e2",
        F.explode(F.sequence("i0", "i1")).alias("i"),
    )
    gus = F.col("i") * _US_PER_H
    return pts.select(
        "user_id",
        F.timestamp_micros(gus).alias("grid_ts"),
        (
            F.col("value")
            + (F.col("v2") - F.col("value"))
            * ((gus - F.col("e1")).cast("double") / (F.col("e2") - F.col("e1")).cast("double"))
        ).alias("val"),
    )


@register(
    "resample_locf_1h",
    oracle=f"""
    WITH dedup AS (
        SELECT user_id, ts, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), seg AS (
        SELECT user_id, ts, value, lead(ts) OVER w AS ts2
        FROM dedup WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        QUALIFY ts2 IS NOT NULL
    ), idx AS (
        SELECT user_id, value,
               (epoch_us(ts) + {_US_PER_H - 1}) // {_US_PER_H} AS i0,
               (epoch_us(ts2) - 1) // {_US_PER_H} AS i1
        FROM seg
    )
    SELECT user_id, make_timestamp(unnest(range(i0, i1 + 1)) * {_US_PER_H}) AS grid_ts,
           value AS val
    FROM idx WHERE i0 <= i1
    """,
)
def resample_locf_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward onto the hourly grid: each grid
    hour takes the most recent event value at or before it (within the
    observed span).  Same plan shape as the interpolation variant minus
    the value arithmetic — downsampling for dashboards/feature tables."""
    e = load_tables(spark, sf_dir, "events")["events"]
    wd = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dedup = (
        e.withColumn("__rn", F.row_number().over(wd))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", "value")
    )
    w = W.partitionBy("user_id").orderBy("ts")
    seg = (
        dedup.select("user_id", "ts", "value", F.lead("ts").over(w).alias("ts2"))
        .where(F.col("ts2").isNotNull())
        .withColumn("e1", F.unix_micros("ts"))
        .withColumn("e2", F.unix_micros("ts2"))
        .withColumn("i0", F.expr(f"(e1 + {_US_PER_H - 1}) div {_US_PER_H}"))
        .withColumn("i1", F.expr(f"(e2 - 1) div {_US_PER_H}"))
        .where(F.col("i0") <= F.col("i1"))
    )
    pts = seg.select("user_id", "value", F.explode(F.sequence("i0", "i1")).alias("i"))
    return pts.select(
        "user_id",
        F.timestamp_micros(F.col("i") * _US_PER_H).alias("grid_ts"),
        F.col("value").alias("val"),
    )


@register(
    "rolling_window_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling aggregate per user — the RANGE-framed
    window (frame membership decided by ORDER-key distance, not row
    count; same-instant peers always share a frame, so the result is
    deterministic without a tiebreak). Frame arithmetic runs in exact
    integer MICROSECONDS on both engines (unix_micros / epoch_us):
    the fixtures carry fractional-second timestamps, and any
    seconds-granularity cast would disagree about frame edges. One
    shuffle on user_id; within a partition Spark keeps a sliding
    frame, O(n) not O(n * frame)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_US_PER_H, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH slides AS (
      SELECT event_type, epoch_us(ts) AS us, unnest(range(0, 4)) AS k
      FROM events),
    w AS (
      SELECT event_type,
             (us // 900000000) * 900000000 - k * 900000000 AS start_us
      FROM slides)
    SELECT make_timestamp(start_us) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY window_start, event_type
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 1-hour length, 15-minute slide, so
    every event lands in exactly 4 overlapping windows. Uses Spark's
    native F.window(slideDuration=...), which expands each row into its
    window memberships inside codegen (the streaming twin of this exact
    expression runs under watermarks in streaming/pipeline.py's
    tumbling variant). The oracle reproduces the epoch-aligned window
    math in integer microseconds: start = floor(t/slide)*slide -
    k*slide for k in 0..3. One shuffle on (window, type); the expand
    multiplies rows 4x BEFORE the partial agg, which map-side combines
    back down — at 100 TB the slide ratio (len/slide) is the expansion
    factor to budget for."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


# --- exponential smoothing -------------------------------------------------

_EWMA_ALPHA = 0.5  # decay weights (1-a)^i are exact binary fractions
_EWMA_K = 8        # bounded memory: 8 lags ~ 0.4% residual weight at a=0.5

_EWMA_DECAY = [(1.0 - _EWMA_ALPHA) ** i for i in range(_EWMA_K)]

_EWMA_ORACLE = (
    """
    WITH w AS (
        SELECT event_id, user_id,
    """
    + ",\n".join(
        f"           lag(value, {i}) OVER win AS l{i}" for i in range(_EWMA_K)
    )
    + """
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_id, user_id,
           round((
    """
    + "\n         + ".join(
        f"CASE WHEN l{i} IS NOT NULL THEN l{i} * {_EWMA_DECAY[i]!r} ELSE 0.0 END"
        for i in range(_EWMA_K)
    )
    + """
           ) / (
    """
    + "\n         + ".join(
        f"CASE WHEN l{i} IS NOT NULL THEN {_EWMA_DECAY[i]!r} ELSE 0.0 END"
        for i in range(_EWMA_K)
    )
    + """
           ), 6) AS ewma
    FROM w
    """
)


def truncated_ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = _EWMA_ALPHA,
    lags: int = _EWMA_K,
    out_col: str = "ewma",
) -> DataFrame:
    """Reusable truncated-EWMA operator: appends ``out_col`` = the
    ``lags``-term exponentially weighted average of ``value_col`` per
    key, ordered by ``order_cols``. Fixed-order lag sum (see
    ``ewma_smooth`` for the determinism/scale contract); weights are
    exact binary fractions when alpha is a power of two."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    decay = [(1.0 - alpha) ** i for i in range(lags)]
    lag_cols = [F.lag(value_col, i).over(w) for i in range(lags)]
    num = None
    den = None
    for i in range(lags):
        t = F.when(lag_cols[i].isNotNull(), lag_cols[i] * F.lit(decay[i])).otherwise(F.lit(0.0))
        d = F.when(lag_cols[i].isNotNull(), F.lit(decay[i])).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    # a row whose ENTIRE lag window is null has den == 0 (shadow-sweep
    # finding: all-null value runs exist in real streams) — emit NULL
    # like DuckDB's /0 instead of throwing under ANSI
    return df.withColumn(out_col, F.when(den != 0.0, num / den))


@register("ewma_smooth", oracle=_EWMA_ORACLE)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponentially weighted moving average over the event
    stream — the smoothing/denoising pass a monitoring or
    feature-engineering pipeline runs before thresholding (the bounded
    sibling of pandas ``ewm(alpha=0.5).mean()`` with an 8-lag horizon,
    normalized over the weights actually present, so series heads are
    unbiased exactly like pandas' ``adjust=True``).

    Exactness across engines: the truncated EWMA is a FIXED-ORDER sum of
    8 lag terms (w0*x_t + w1*x_{t-1} + ...) — never an unordered
    aggregate — and with alpha = 0.5 every weight is an exact binary
    fraction, so Spark and DuckDB produce bit-identical doubles before
    the final round. One shuffle (the per-user window); the lag chain is
    a single window spec, so Spark evaluates all 8 lags in one pass over
    each sorted partition. Infinite-horizon EWMA is inherently
    sequential (y_t depends on y_{t-1}); the truncation is what makes it
    a window expression that parallelizes per key at 100 TB."""
    e = load_tables(spark, sf_dir, "events")["events"]
    out = truncated_ewma(e, ["user_id"], ["ts", "event_id"], "value")
    return out.select("event_id", "user_id", F.round("ewma", 6).alias("ewma"))


@register(
    "acf_lags",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               lag(value, 1) OVER w AS l1,
               lag(value, 2) OVER w AS l2,
               lag(value, 3) OVER w AS l3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    a AS (SELECT user_id,
                 corr(value, l1) AS a1,
                 corr(value, l2) AS a2,
                 corr(value, l3) AS a3
          FROM s GROUP BY user_id)
    SELECT user_id, 1 AS lag, round(a1, 6) AS acf FROM a
    UNION ALL SELECT user_id, 2 AS lag, round(a2, 6) AS acf FROM a
    UNION ALL SELECT user_id, 3 AS lag, round(a3, 6) AS acf FROM a
    """,
)
def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1-3 — the seasonality /
    persistence fingerprint a forecasting or anomaly pipeline computes
    before choosing a model (and the statistical cousin of the
    text_repetition_signals lane: self-similarity of a sequence with a
    shifted copy of itself).

    Shape: ONE per-user window pass evaluates all three lag columns
    (one shuffle on the series key, lags share the sort), then a single
    groupBy computes the three Pearson correlations map-side-partially;
    the lag unpivot is a zero-shuffle stack over the 3 aggregate
    columns.  corr() pairs are the non-null (x_t, x_{t-k}) overlaps —
    both engines skip null pairs, so series heads shorter than the lag
    contribute nothing.  Pearson is spelled try_divide(covar_samp,
    stddev*stddev) over the PAIRED rows rather than the corr() builtin:
    under ANSI mode (Spark 4 default) corr() RAISES DIVIDE_BY_ZERO on a
    zero-variance series while DuckDB's corr returns NULL — the
    try_divide form pins both engines to NULL on degenerate input
    (DEVNOTES hazard family).  Rounded to 6 decimals: the corr moments
    are unordered float sums."""
    from pyspark.sql.window import Window as W

    e = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
    )

    def _corr(col: str):
        # both stddevs over the PAIRED set (value AND lag non-null) —
        # covar_samp skips half-null pairs, so the moments must too;
        # masking only one side diverged from corr() once null values
        # appeared in the series (shadow-sweep finding)
        pair = F.col(col).isNotNull() & F.col("value").isNotNull()
        return F.try_divide(
            F.covar_samp(F.col("value"), F.col(col)),
            F.stddev_samp(F.when(pair, F.col("value")))
            * F.stddev_samp(F.when(pair, F.col(col))),
        )

    a = s.groupBy("user_id").agg(
        _corr("l1").alias("a1"), _corr("l2").alias("a2"), _corr("l3").alias("a3")
    )
    return a.select(
        "user_id",
        F.expr("stack(3, 1, round(a1, 6), 2, round(a2, 6), 3, round(a3, 6)) AS (lag, acf)"),
    )


_SAX_SEGMENTS = 4
_SAX_BREAKS = (-0.4307, 0.4307)  # Gaussian tertile breakpoints, alphabet {a,b,c}



def _sax_words(e: DataFrame) -> DataFrame:
    """Shared PAA+SAX symbolization: events -> one row per user with
    the SAX word and the z-scored PAA components z0..z{n-1} (the exact
    and capped catalog twins both build on this)."""
    from pyspark.sql.window import Window as W

    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    wa = W.partitionBy("user_id")
    idx = e.select(
        "user_id",
        "value",
        (F.row_number().over(wo) - 1).alias("i"),
        F.count("*").over(wa).alias("n"),
    )
    stats = e.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.greatest(F.stddev_samp("value"), F.lit(1e-12)).alias("sigma"),
    )
    paa = idx.groupBy(
        "user_id",
        F.floor(F.col("i") * _SAX_SEGMENTS / F.col("n")).cast("int").alias("seg"),
    ).agg(F.avg("value").alias("pv"))
    z = F.round((F.col("pv") - F.col("mu")) / F.col("sigma"), 6)
    lets = paa.join(stats, "user_id").select(
        "user_id",
        "seg",
        F.when(z <= _SAX_BREAKS[0], "a")
        .when(z <= _SAX_BREAKS[1], "b")
        .otherwise("c")
        .alias("ltr"),
        z.alias("z"),
    )
    segs = range(_SAX_SEGMENTS)
    return lets.groupBy("user_id").agg(
        F.concat(
            *[F.max(F.when(F.col("seg") == k, F.col("ltr"))) for k in segs]
        ).alias("word"),
        *[F.max(F.when(F.col("seg") == k, F.col("z"))).alias(f"z{k}") for k in segs],
    )


def _sax_pairs(words: DataFrame) -> DataFrame:
    """Word equi-join + PAA L2 over symbolized series."""
    segs = range(_SAX_SEGMENTS)
    a, b = words.alias("a"), words.alias("b")
    dist2 = sum(
        (F.col(f"a.z{k}") - F.col(f"b.z{k}")) * (F.col(f"a.z{k}") - F.col(f"b.z{k}"))
        for k in segs
    )
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.word").alias("sax_word"),
            F.round(dist2, 6).alias("paa_dist2"),
        )
    )


@register(
    "sax_similarity_candidates",
    oracle=f"""
    WITH idx AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ),
    stats AS (
        SELECT user_id, avg(value) AS mu,
               greatest(stddev_samp(value), 1e-12) AS sigma
        FROM events GROUP BY user_id
    ),
    paa AS (
        SELECT user_id, CAST(floor(i * {_SAX_SEGMENTS} / n) AS INTEGER) AS seg,
               avg(value) AS pv
        FROM idx GROUP BY 1, 2
    ),
    lets AS (
        SELECT p.user_id, p.seg,
               CASE WHEN round((p.pv - s.mu) / s.sigma, 6) <= {_SAX_BREAKS[0]} THEN 'a'
                    WHEN round((p.pv - s.mu) / s.sigma, 6) <= {_SAX_BREAKS[1]} THEN 'b'
                    ELSE 'c' END AS ltr,
               round((p.pv - s.mu) / s.sigma, 6) AS z
        FROM paa p JOIN stats s USING (user_id)
    ),
    words AS (
        SELECT user_id,
               {" || ".join(f"max(CASE WHEN seg = {k} THEN ltr END)" for k in range(_SAX_SEGMENTS))} AS word,
               {", ".join(f"max(CASE WHEN seg = {k} THEN z END) AS z{k}" for k in range(_SAX_SEGMENTS))}
        FROM lets GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b, a.word AS sax_word,
           round({" + ".join(f"(a.z{k} - b.z{k}) * (a.z{k} - b.z{k})" for k in range(_SAX_SEGMENTS))}, 6)
               AS paa_dist2
    FROM words a JOIN words b
      ON a.word = b.word AND a.user_id < b.user_id
    """,
)
def sax_similarity_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity candidates via PAA + SAX symbolization
    (Lin et al. 2003; the indexing layer behind the retrieved top-k
    similarity-search papers): z-normalize each series, collapse it to
    {_SAX_SEGMENTS} piecewise-aggregate means, bucket each into a
    Gaussian-breakpoint letter, and equi-join the resulting words —
    candidate pairs come from an INDEX lookup (identical 'cbba'-style
    words), never a pairwise distance matrix.

    Scale shape: three window/agg passes per series (all sharing the
    user_id shuffle), then the word join whose fan-out is bounded by
    bucket occupancy — the lever is word length x alphabet size, grown
    with corpus size exactly like LSH bands.  The PAA L2 distance rides
    along for downstream exact re-ranking (the candidates are a
    superset of close pairs under the standard SAX lower-bound).
    Z-scores round to 6 BEFORE bucketing in both engines (letter
    assignment must not flap on unordered-sum ULP; sigma floored
    identically, DEVNOTES #40/#44 family).

    Honest caveat: on UNSTRUCTURED noise the PAA means shrink toward 0
    (std ~ 1/sqrt(points-per-segment)) so most words degenerate to
    'bbbb' and the candidate set stays dense — noise has no structure
    to index, and SAX correctly says so.  On trended/seasonal series
    the words separate and the join prunes hard (pinned in
    tests/test_graph_triangles_acf.py with up/down/flat shapes)."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return _sax_pairs(_sax_words(e))


from tcdb_spark.plans.catalog import ORACLES as _ORACLES  # noqa: E402


@register("sax_similarity_capped", oracle=_ORACLES["sax_similarity_candidates"])
def sax_similarity_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION twin of sax_similarity_candidates: identical
    pipeline with the hot-word df-cap in front of the join
    (textdedup.drop_hot_keys) — the guard that kept the degenerate
    25M-event smoke from attempting 3.1e10 pairs (SCALE_SMOKE.md).
    The cap (1000) sits above any word's occupancy at test scale, so
    this shares the EXACT query's oracle verbatim — the driver
    hash-match attests the capped path is lossless when no bucket is
    hot (the salted-equivalence convention; the smoke attests the hot
    case)."""
    from tcdb_spark.operators.textdedup import drop_hot_keys

    e = load_tables(spark, sf_dir, "events")["events"]
    return _sax_pairs(drop_hot_keys(_sax_words(e), "word", df_cap=1000))
