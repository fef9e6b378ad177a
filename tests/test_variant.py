"""VARIANT semi-structured surface: try_variant_get tolerance for
malformed/missing/mistyped documents (the property from_json+schema
cannot give without nulling the whole struct)."""

from pyspark.sql import functions as F


def test_try_variant_get_malformed_and_missing(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": "not-a-number"}'),
            (3, '{"other": 1}'),
            (4, "not json at all"),
            (5, None),
        ],
        "id long, props string",
    )
    out = df.select(
        "id",
        F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k"),
    ).collect()
    got = {r.id: r.k for r in out}
    assert got == {1: 7, 2: None, 3: None, 4: None, 5: None}


def test_variant_schema_introspection(spark):
    df = spark.createDataFrame([('{"k": 1, "tags": ["a"]}',)], "props string")
    sch = df.select(
        F.schema_of_variant(F.parse_json("props")).alias("s")
    ).first()["s"]
    assert "k" in sch and "tags" in sch
