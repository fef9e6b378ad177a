"""tcdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference tropical-cyclone database
pipeline (jjm0022/tcdb), re-expressed Spark-first.

Layout:
    session.py    — SparkSession factory tuned for local[N] and cluster
    schemas.py    — explicit StructTypes (never inferSchema in prod paths)
    functions/    — pure Column-expression scalar/text/vector functions
    operators/    — DataFrame -> DataFrame operators (joins, aggs, windows,
                    pivot, merge, dedup, similarity, validation)
    sources/      — ATCF deck / tcvitals / ensemble / multimodal readers,
                    ingest ledger, sinks
    plans/        — the query catalog exposed through __spark_entry__.py
    streaming/    — incremental micro-batch pipelines
"""

__version__ = "0.1.0"
