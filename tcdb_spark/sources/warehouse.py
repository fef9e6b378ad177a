"""Versioned parquet warehouse — the vanilla-parquet stand-in for a
lakehouse table format (Delta/Iceberg jars are not in this image; on a
real cluster `merge()` maps onto MERGE INTO and this module disappears).

Each table lives at ``root/<name>/v=<n>/`` with a ``_LATEST`` pointer
written last, so readers never see a half-written version and MERGE
(read latest -> full-outer-join -> write next version -> repoint) is
atomic at the pointer swap. Old versions are retained (cheap time travel,
mirrors the reference's timestamped data-lake file versions,
tcdb/pipeline/bdeck.py:96-103).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._dir(table), "_LATEST")

    def current_version(self, table: str) -> int | None:
        p = self._pointer(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        """Latest version, or an empty frame with ``schema`` if absent.
        Bucketed versions are read through the session catalog — bucket
        metadata only exists there, and it is what lets joins/MERGEs on
        the bucket key skip their Exchange."""
        v = self.current_version(table)
        if v is None:
            if schema is None:
                raise FileNotFoundError(f"table {table} missing and no schema given")
            return self.spark.createDataFrame([], schema)
        if os.path.exists(self._bucket_marker(table, v)):
            return self.spark.table(self._ensure_registered(table, v))
        return self.spark.read.parquet(os.path.join(self._dir(table), f"v={v}"))

    def _ensure_registered(self, table: str, v: int) -> str:
        """The in-memory catalog dies with the session; the marker file
        carries the bucket spec + schema so any later session can
        re-register the external table and keep the shuffle-free plan."""
        name = self._catalog_name(table, v)
        if self.spark.catalog.tableExists(name):
            return name
        with open(self._bucket_marker(table, v)) as f:
            spec = json.load(f)
        schema = T.StructType.fromJson(spec["schema"])
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        sort = ", ".join(f"`{c}`" for c in spec["sort_cols"])
        cluster = ", ".join(f"`{c}`" for c in spec["bucket_cols"])
        path = os.path.join(self._dir(table), f"v={v}")
        self.spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"CLUSTERED BY ({cluster}) SORTED BY ({sort}) "
            f"INTO {spec['n_buckets']} BUCKETS LOCATION '{path}'"
        )
        return name

    def _catalog_name(self, table: str, v: int) -> str:
        return f"wh_{table}__v{v}"

    def _bucket_marker(self, table: str, v: int) -> str:
        return os.path.join(self._dir(table), f"_BUCKETED_v{v}")

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> int:
        """Write the next version hash-bucketed on ``bucket_cols`` —
        the 100 TB layout for observations/steps (bucket by storm_id):
        every MERGE and fact-fact join on the key reads co-located
        buckets and skips the table-side shuffle entirely.  Bucketing
        rides the catalog (``bucketBy`` requires ``saveAsTable``), so
        each version is an external catalog table over the same
        versioned path, and the pointer swap stays the commit."""
        v = (self.current_version(table) or 0) + 1
        path = os.path.join(self._dir(table), f"v={v}")
        name = self._catalog_name(table, v)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
        w = w.sortBy(*(sort_cols or bucket_cols))
        w.option("path", path).format("parquet").saveAsTable(name)
        spec = {
            "schema": df.schema.jsonValue(),
            "bucket_cols": bucket_cols,
            "sort_cols": sort_cols or bucket_cols,
            "n_buckets": n_buckets,
        }
        with open(self._bucket_marker(table, v), "w") as f:
            json.dump(spec, f)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(table))
        return v

    def write(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Write the next version and repoint. The full write lands before
        the pointer moves — crash mid-write leaves the old version live."""
        v = (self.current_version(table) or 0) + 1
        path = os.path.join(self._dir(table), f"v={v}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(table))
        return v
