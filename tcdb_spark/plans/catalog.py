"""Registry of (query, oracle) pairs — the driver contract.

Every implemented operator from SURVEY.md §2 registers a callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) an equivalent
DuckDB SQL string over the same parquet tables. The driver hash-compares
the two at sf=0.01; names and column aliases MUST match on both sides.

Comparison rules baked into every pair:
- alias every computed column identically in Spark and SQL;
- cast count/sum-of-int aggregates to BIGINT on the DuckDB side (DuckDB
  widens integer sums to HUGEINT, Spark keeps LongType);
- round floating-point aggregates on BOTH sides (summation order differs
  between engines at the last ULP);
- deterministic tiebreaks on every window/rank (ties must not flap).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _pin_session(spark: SparkSession) -> None:
    """Defensive session pinning: oracle comparisons assume UTC timestamps
    (DuckDB is tz-naive) and nanos-parquet readability, regardless of how
    the caller built its SparkSession."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable and optionally its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # tools/catalog_map.py resolves file:line
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _read(spark: SparkSession, path: str) -> DataFrame:
    try:
        # TIMESTAMP(NANOS) parquet (events.ts) is unreadable without this
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark.read.parquet(path)


def fan_out_scan(df: DataFrame) -> DataFrame:
    """Fan a too-few-splits scan out to the session's parallelism —
    PER-LANE opt-in for operators whose per-row work is heavy (HTML
    parsing, md5-per-gram hashing, per-char entropy): when the scan
    yields fewer splits than the cores (the sf tables are ONE parquet
    file with ONE row group), the consumer's first — often dominant —
    stage runs on that few cores (guide §2.5 "input skew").

    Guarded to a NO-OP whenever the scan already has >=
    default-parallelism splits — at any real scale the exchange
    vanishes and no payload is ever shuffled.

    Opt-in per lane, NOT blanket on the table (round 8, interleaved
    per-lane A/B at sf0.1): the repartition costs a payload shuffle +
    one extra stage, which only pays when downstream per-row work
    dominates.  Parse-heavy lanes won (html_extract −0.38 s,
    html_boilerplate −0.31 s, winnow −0.28 s, char_entropy −0.20 s,
    gopher −0.19 s of ~0.5-1.2 s lanes); every cheap-projection lane
    lost (dedup_simhash +0.86 s, bloom +0.47 s, url_dedup +0.44 s) and
    every embeddings lane lost (knn +0.52 s, ivfpq +0.55 s) — 2000
    64-float rows parallelize worse than they shuffle.  Row-level
    results are partitioning-independent (determinism lint +
    repartition-invariance tests, r8s1); every oracle re-attested."""
    spark = df.sparkSession
    try:
        n = df.rdd.getNumPartitions()
        tgt = spark.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — e.g. Connect; skip the rewrite
        return df
    if n < tgt:
        return df.repartition(tgt)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read driver testdata parquet tables (TESTDATA.md).

    Timestamp normalization — the driver's generator has shipped two
    physical types for ``events.ts`` across rounds, and both must land
    as plain TimestampType in a UTC session so every downstream cast
    and oracle compare agrees with DuckDB's naive read:

    - TIMESTAMP(NANOS): Spark only reads it as long (``nanosAsLong``);
      truncated ns->us exactly like DuckDB's TIMESTAMP_NS cast.
    - timestamp[us] without timezone: Spark 4 infers TIMESTAMP_NTZ,
      which refuses numeric casts and breaks epoch arithmetic; under
      the pinned UTC session tz, casting NTZ -> TIMESTAMP is
      wall-clock-identical.
    """
    from pyspark.sql import functions as F

    # DataFrame-construction cache (plan objects only — data is still
    # scanned per execution): schema fetch + dtype walk cost ~0.1 s of
    # py4j round-trips per call, paid by every catalog query.  Keyed by
    # applicationId (a stopped session's plans are never reused) plus a
    # CONTENT FINGERPRINT of the table path (mtime_ns + size, one level
    # deep for directories), so any path is safely cacheable and a
    # rewrite under the same path is a cache miss — no special-cased
    # driver paths (VERDICT r8 #6).
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — e.g. Connect; just skip caching
        app = None

    out = {}
    for n in names:
        path = f"{sf_dir}/{n}.parquet"
        key = None
        if app is not None:
            fp = _path_fingerprint(path)
            if fp is not None:
                key = (app, path, fp)
        if key is not None and key in _TABLE_CACHE:
            out[n] = _TABLE_CACHE[key]
            continue
        df = _read(spark, path)
        for col, dtype in df.dtypes:
            if col == "ts" and dtype == "bigint":
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
            elif dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        out[n] = df
        if key is not None:
            _TABLE_CACHE[key] = df
    return out


def _path_fingerprint(path: str):
    """(mtime_ns, size) fingerprint of a table path — for a directory,
    the dir's own stat plus every direct child's (name, mtime_ns, size),
    so an overwrite under the same path invalidates the plan cache.
    Returns None (uncacheable) when the path can't be stat'd."""
    import os

    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        entries = tuple(
            sorted(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in os.scandir(path)
            )
        )
        return (st.st_mtime_ns, st.st_size, entries)
    except OSError:
        return None
