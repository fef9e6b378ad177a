"""End-to-end JDBC source/sink against embedded Derby (the Derby jars
ship with Spark for the Hive metastore, so the stock JDBC data source is
fully exercisable in this image: real SQL database, real driver, real
partitioned parallel pulls)."""

from pyspark.sql import functions as F

from tcdb_spark.sources.jdbc import read_jdbc_table, write_jdbc_table

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    # Derby writes derby.log into the JVM's CWD (the repo root under
    # pytest) unless told otherwise; it reads this property at engine
    # boot, i.e. at the first connection below
    spark._jvm.System.setProperty("derby.stream.error.file", str(tmp_path / "derby.log"))
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("obs_id"),
        (F.col("id") % 37).cast("double").alias("wind"),
        F.concat(F.lit("s"), (F.col("id") % 10)).alias("storm"),
    )
    write_jdbc_table(spark, df, url, "observations", driver=DERBY)

    back = read_jdbc_table(
        spark,
        url,
        "observations",
        partition_column="obs_id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
        driver=DERBY,
    )
    # partitioned parallel pull: 4 range-sliced connections
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    agg = back.groupBy("storm").agg(F.sum("wind").alias("s")).collect()
    exp = {r["storm"]: r["s"] for r in df.groupBy("storm").agg(F.sum("wind").alias("s")).collect()}
    assert {r["storm"]: r["s"] for r in agg} == exp

    # append mode adds rows through the same sink
    write_jdbc_table(spark, df.limit(10), url, "observations", mode="append", driver=DERBY)
    assert read_jdbc_table(spark, url, "observations", driver=DERBY).count() == 1010
