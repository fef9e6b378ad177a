"""Sinks (SURVEY.md §2.1): partitioned columnar/CSV/JSON writes replacing
the reference's file-per-group Python loops.

- The per-(init, model) CSV splitting loop (tcdb/pipeline/adeck.py:93-111)
  becomes ONE ``partitionBy("init_date", "model").parquet/csv`` write —
  the partitioned layout IS the file-per-group contract, produced by the
  executors in parallel.
- JSON document sinks (invest files tcdb/models/invest.py:175-209,
  per-datetime observation JSONs tcdb/pipeline/process_obs.py:93-103,
  full-table dumps test.py:23-43) become ``to_json(struct(...))`` /
  ``write.json`` with ISO-8601 timestamps (the json_encode contract,
  tcdb/utils.py:8-47).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ISO = "yyyy-MM-dd'T'HH:mm:ss"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Partitioned write: one directory per group, written in parallel
    (replaces tcdb/pipeline/adeck.py:93-111's per-group to_csv loop)."""
    w = df.write.mode(mode).partitionBy(*partition_by)
    getattr(w, fmt)(path)


def json_encode_row(df: DataFrame, exclude: list[str] | None = None) -> DataFrame:
    """Serialize each row to one JSON document column ``json`` with
    ISO-8601 timestamps — the reference's ``json_encode`` behavior
    (datetime -> isoformat, tcdb/utils.py:8-47) without per-row Python."""
    exclude = set(exclude or [])
    cols: list[Column] = []
    for name, dtype in df.dtypes:
        if name in exclude:
            continue
        if dtype.startswith("timestamp"):
            cols.append(F.date_format(F.col(name), ISO).alias(name))
        else:
            cols.append(F.col(name))
    return df.withColumn("json", F.to_json(F.struct(*cols)))


def write_json_documents(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON export (full-table dumps, test.py:23-43)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("timestamp"):
            out = out.withColumn(name, F.date_format(F.col(name), ISO))
    out.write.mode(mode).json(path)


SINGLE_FILE_MAX_ROWS = 5_000_000  # past this, one task writing one file stalls


def export_tables(
    warehouse,
    out_dir: str,
    tables: list[str],
    fmt: str = "csv",
    single_file_max_rows: int = SINGLE_FILE_MAX_ROWS,
) -> dict[str, int]:
    """Validation-export dump of warehouse tables (db/sql_export.py:1-29:
    per-table CSV snapshots for golden comparison). Timestamps ISO-8601
    for stable text round-trips. Returns per-table row counts.

    Small tables coalesce to one file (the golden-diff use case wants a
    single CSV); past ``single_file_max_rows`` the export writes
    partitioned instead — an unguarded coalesce(1) funnels the whole
    table through one task, which is a stall at warehouse scale."""
    counts = {}
    for t in tables:
        df = warehouse.read(t)
        out = df
        for name, dtype in df.dtypes:
            if dtype.startswith("timestamp"):
                out = out.withColumn(name, F.date_format(F.col(name), ISO))
        n = df.count()
        if n <= single_file_max_rows:
            out = out.coalesce(1)
        w = out.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(f"{out_dir}/{t}")
        else:
            getattr(w, fmt)(f"{out_dir}/{t}")
        counts[t] = n
    return counts


def invest_documents(storms: DataFrame, observations: DataFrame) -> DataFrame:
    """Invest JSON view: one document per invest storm with its latest
    observation inlined — the read-modify-write invest file
    (tcdb/models/invest.py:175-209) as a MERGE-maintained table + JSON
    projection instead of driver-side file surgery."""
    from pyspark.sql.window import Window as W

    latest_obs = (
        observations.withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("storm_id").orderBy(F.col("datetime_utc").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .select(
            "storm_id",
            F.col("datetime_utc").alias("obs_time"),
            "latitude",
            "longitude",
            "intensity_kts",
            "mslp_mb",
        )
    )
    invests = storms.where(F.col("nhc_number") >= 90)
    joined = invests.join(latest_obs, on="storm_id", how="left")
    return json_encode_row(joined, exclude=["run_id", "last_update"])


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Columnar interchange sink over every format this Spark build
    carries natively: parquet (the warehouse default), ORC (parity
    with Hive-side consumers — same predicate pushdown and column
    pruning as parquet, pinned in tests), and XML (rowTag documents,
    the ATCF-adjacent feed format).  Avro prefers the external
    spark-avro module; absent (as in this image), flat scalar schemas
    route to the pure-stdlib container writer
    (sources/avro_fallback.py — spec-conformant Object Container Files
    any stock Avro consumer reads); only the spark-avro-specific knobs
    (partition_by, writer options, nested types) still raise the
    actionable jar error."""
    if fmt == "avro":
        try:
            df.write.mode(mode).format("avro").save(path)
            return
        except Exception as exc:
            if partition_by or options:
                raise NotImplementedError(
                    "spark-avro module not on the classpath (and the "
                    "stdlib Avro fallback does not take partition_by/"
                    "options); add org.apache.spark:spark-avro via "
                    "spark.jars.packages at deploy time. "
                    f"Underlying error: {exc}"
                ) from exc
            from tcdb_spark.sources.avro_fallback import write_avro_files

            if mode == "overwrite":
                import shutil as _shutil

                _shutil.rmtree(path, ignore_errors=True)
            elif mode != "error":
                raise NotImplementedError(
                    f"avro fallback supports overwrite/error modes, not {mode}"
                ) from exc
            write_avro_files(df, path)
            return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in options.items():
        w = w.option(k, v)
    if fmt == "xml" and "rowTag" not in options:
        w = w.option("rowTag", "row")
    w.format(fmt).save(path)


def read_columnar(spark, path: str, fmt: str = "parquet", schema=None, **options):
    """Reader twin of :func:`write_columnar` (schema-explicit where the
    format is schemaless on read, e.g. XML — never inferSchema in a
    pipeline, SURVEY §2.9 check-type).  Avro mirrors the writer's
    routing: spark-avro when the jar is present, else the stdlib
    container reader (self-describing headers, no schema needed)."""
    if fmt == "avro":
        try:
            r = spark.read
            if schema is not None:
                r = r.schema(schema)
            return r.format("avro").load(path)
        except Exception:
            from tcdb_spark.sources.avro_fallback import read_avro_files

            return read_avro_files(spark, path)
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    if fmt == "xml" and "rowTag" not in options:
        r = r.option("rowTag", "row")
    return r.format(fmt).load(path)
