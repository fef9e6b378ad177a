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


# Corpus tables whose per-row work downstream is heavy (text parsing,
# hashing, HTML/WARC decoding, vector math): when the parquet scan
# yields fewer splits than the session's parallelism, the first —
# often dominant — stage of every consumer runs on that few cores.
# Measured round 8 (guide §2.5 "input skew"): the sf0.1 tables are
# each ONE file with ONE row group, so the whole text/web family ran
# its parse stage on 1 of 32 cores (winnow 0.95 s, html_extract
# 0.87 s, boilerplate 0.98 s single-task stage walls).  The fix fans
# the scan out with an explicit round-robin repartition, guarded so it
# is a NO-OP whenever the scan already has >= default-parallelism
# splits — i.e. at any real scale the exchange vanishes and no text
# payload is ever shuffled.  Row-level results are partitioning-
# independent across the catalog (determinism lint + repartition-
# invariance tests, r8s1), and every oracle was re-attested after
# this change.
_FAN_OUT_TABLES = {"documents", "embeddings"}


def _fan_out_scan(df: DataFrame) -> DataFrame:
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

    # DataFrame-construction cache for the immutable driver testdata
    # dirs ONLY (never tmp/warehouse paths, whose contents change under
    # the same path): schema fetch + dtype walk cost ~0.1 s of py4j
    # round-trips per call, paid by every catalog query. Keyed by
    # applicationId so a stopped session's plans are never reused.
    cacheable = sf_dir.startswith("/root/testdata")
    app = None
    if cacheable:
        try:
            app = spark.sparkContext.applicationId
        except Exception:  # noqa: BLE001 — e.g. Connect; just skip caching
            cacheable = False

    out = {}
    for n in names:
        key = (app, sf_dir, n)
        if cacheable and key in _TABLE_CACHE:
            out[n] = _TABLE_CACHE[key]
            continue
        df = _read(spark, f"{sf_dir}/{n}.parquet")
        for col, dtype in df.dtypes:
            if col == "ts" and dtype == "bigint":
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
            elif dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        if n in _FAN_OUT_TABLES:
            df = _fan_out_scan(df)
        out[n] = df
        if cacheable:
            _TABLE_CACHE[key] = df
    return out
