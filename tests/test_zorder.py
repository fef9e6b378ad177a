"""Z-order clustering: the Morton key must be a correct bit
interleaving, the clustered write must preserve content, and — the
point — row-group min/max statistics must prune a 2-D box predicate
that a 1-D sort cannot prune on its second dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcdb_spark.sources.clustering import (
    morton_key,
    row_groups_matching,
    write_zordered,
    zorder_key,
)


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    out = df.select(morton_key([F.col("a"), F.col("b")], bits=4).alias("z")).collect()
    # bit i of a -> key bit 2i; bit i of b -> key bit 2i+1
    def ref(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    got = [r["z"] for r in out]
    assert got == [ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5)]


def test_zorder_key_locality(spark):
    """Nearby points in (x, y) get nearby keys: the key range spanned by
    a small box is far smaller than the full key space."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("x"), (F.col("id") / 100).cast("long").alias("y")
    )
    keyed = df.withColumn("z", zorder_key(df, ["x", "y"], bits=8))
    box = keyed.where((F.col("x") < 10) & (F.col("y") < 10))
    full_span = keyed.agg(F.max("z") - F.min("z")).first()[0]
    box_span = box.agg(F.max("z") - F.min("z")).first()[0]
    assert box_span < full_span / 16, (box_span, full_span)


def test_zordered_write_prunes_both_dimensions(spark, tmp_path):
    """The skipping experiment: uniform 2-D data, 1% box predicate.
    Sorted-by-x prunes x but reads ~everything for a y-only filter;
    Z-order prunes BOTH; content survives clustering byte-for-byte."""
    n = 400_000
    df = spark.range(0, n).select(
        F.col("id"),
        F.pmod(F.hash(F.col("id")), F.lit(1000)).cast("double").alias("x"),
        F.pmod(F.hash(F.col("id") + 7), F.lit(1000)).cast("double").alias("y"),
    )
    paths = {k: str(tmp_path / k) for k in ("plain", "xsort", "zorder")}
    df.repartition(4).write.mode("overwrite").option(
        "parquet.block.size", "65536"
    ).parquet(paths["plain"])
    df.repartitionByRange(4, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).option("parquet.block.size", "65536").parquet(paths["xsort"])
    write_zordered(df, paths["zorder"], ["x", "y"], n_files=4, block_bytes=65536)

    # content identical after clustering
    back = spark.read.parquet(paths["zorder"])
    assert back.count() == n
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]

    box = {"x": (0.0, 99.0), "y": (0.0, 99.0)}   # 1% of the plane
    frac = {}
    for k, p in paths.items():
        hit, total = row_groups_matching(p, box)
        assert total >= 8, f"{k}: too few row groups ({total}) for a meaningful test"
        frac[k] = hit / total
    # unclustered layout reads everything
    assert frac["plain"] > 0.9, frac
    # z-order must beat both: it prunes in x AND y
    assert frac["zorder"] < 0.5, frac
    assert frac["zorder"] < frac["xsort"] - 0.05 or frac["xsort"] < 0.2, frac

    # y-only predicate: the x-sorted layout cannot prune, z-order can
    ybox = {"y": (0.0, 99.0)}
    yhit_x, ytot_x = row_groups_matching(paths["xsort"], ybox)
    yhit_z, ytot_z = row_groups_matching(paths["zorder"], ybox)
    assert yhit_x / ytot_x > 0.9, "x-sort unexpectedly pruned a y filter"
    assert yhit_z / ytot_z < 0.6, (yhit_z, ytot_z)


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """A join against a filtered dim must inject a dynamicpruning
    subquery into the partitioned fact scan — the runtime analog of
    static partition pruning, and the mechanism that keeps
    date-partitioned warehouse layouts from scanning the lake when the
    partition keys only become known at run time."""
    from pyspark.sql import functions as F

    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(0, 100_000).select(
        (F.col("id") % 20).alias("d"), F.col("id").alias("v")
    ).write.partitionBy("d").parquet(fact_p)
    spark.range(0, 20).select(
        F.col("id").alias("d"), (F.col("id") % 5).alias("tag")
    ).write.parquet(dim_p)

    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p).where(F.col("tag") == 0)
    j = fact.join(dim, "d")
    assert j.count() == 100_000 // 20 * 4  # 4 of 20 partitions survive
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned scan still projects only the referenced column
    read = plan.split("ReadSchema")[1][:100]
    assert "v:bigint" in read


def test_compact_with_zorder(spark, tmp_path):
    """OPTIMIZE-ZORDER path of Warehouse.compact: content identical,
    multi-column box predicate skips row groups after the rewrite."""
    import glob as g

    from pyspark.sql import functions as F

    from tcdb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = 40_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 7919) % 1000)
        .withColumn("y", (F.col("id") * 104729) % 1000)
        .repartition(16)  # fragmented, unordered layout
    )
    wh.write("pts", df)
    before = wh.read("pts").agg(F.sum(F.hash("id", "x", "y"))).first()[0]

    info = wh.compact("pts", target_file_bytes=64 * 1024, zorder_cols=["x", "y"])
    assert info["version"] == 2
    after = wh.read("pts").agg(F.sum(F.hash("id", "x", "y"))).first()[0]
    assert before == after  # rewrite is content-identical

    # a 10%x10% box should now skip most row groups in every file
    from tcdb_spark.sources.clustering import row_groups_matching

    files = g.glob(str(tmp_path / "wh" / "pts" / "v=2" / "*.parquet"))
    hit = tot = 0
    for p in files:
        h, t = row_groups_matching(p, {"x": (0, 100), "y": (0, 100)})
        hit += h
        tot += t
    assert tot > 4
    assert hit / tot < 0.5, f"z-order should prune: {hit}/{tot}"

    # bucketed tables refuse the option
    wh.write_bucketed("bk", df, ["id"], 4, ["id"])
    try:
        wh.compact("bk", zorder_cols=["x"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
