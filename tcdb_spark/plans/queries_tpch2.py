"""TPC-H Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22 shapes —
completing the 22-query suite (Q1/Q3/Q5 in queries_core, Q4/Q6/Q10/
Q12/Q14/Q18 in queries_tpch).

The synthetic schema has no partsupp table, so the five queries that
read it (Q2/Q9/Q11/Q16/Q20) keep their PLAN SHAPE — correlated min,
scalar-subquery threshold, count-distinct with NOT IN, nested semi
joins — over `SELECT DISTINCT l_partkey, l_suppkey FROM lineitem` as
the part<->supplier bridge, and stand-in cost/value expressions (noted
per query). The shapes, not the constants, are what a 100 TB engine
must execute well; every docstring states the plan it must compile to.

Money aggregates follow the DECIMAL(18,4) contract from q10
(queries_tpch.py): sum in decimal (exact, order-independent across
engines and partitionings), round, cast to double last — a
double-summed revenue differs in the last ULP between Spark's
partial-agg tree and DuckDB's sequential sum, and can flip a rounding
tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tcdb_spark.plans.catalog import load_tables, register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _dec(col: str):
    return F.col(col).cast("decimal(18,4)")


def _dec_rev():
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))


def _pairs(t) -> DataFrame:
    """The partsupp stand-in: observed (partkey, suppkey) pairs.

    One shuffle on the composite key; at 100 TB this is a map-side
    partially-aggregated distinct, far smaller than lineitem itself.
    """
    return t["lineitem"].select("l_partkey", "l_suppkey").distinct()


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    elig AS (SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
      FROM pairs JOIN part ON p_partkey=l_partkey JOIN supplier ON s_suppkey=l_suppkey
           JOIN nation ON s_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey
    FROM elig e WHERE s_acctbal = (SELECT min(s_acctbal) FROM elig e2 WHERE e2.p_partkey = e.p_partkey)
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part correlated MIN, answered with one
    window over the eligible set instead of a re-scan per part — the
    correlated subquery decorrelates to min().over(partitionBy part).
    part/supplier/nation/region all broadcast into the distinct-pairs
    stream, so the only shuffles are the pair distinct and the window's
    hash partitioning on p_partkey. Ties on the min keep every tied
    supplier (set semantics, same as the SQL). (Stand-ins: lineitem
    pairs for partsupp, s_acctbal for ps_supplycost.)"""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    elig = (
        _pairs(t)
        .join(F.broadcast(t["part"].where(F.col("p_size") == 15)),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc(), F.col("s_suppkey").asc())
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "s_suppkey")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, CAST(round(sum(dec_rev),2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                 CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS dec_rev
          FROM lineitem JOIN supplier ON s_suppkey=l_suppkey JOIN orders ON o_orderkey=l_orderkey
               JOIN customer ON c_custkey=o_custkey
               JOIN nation n1 ON s_nationkey=n1.n_nationkey JOIN nation n2 ON c_nationkey=n2.n_nationkey
          WHERE ((n1.n_name='NATION_1' AND n2.n_name='NATION_2') OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations by year. The
    supplier side (supplier x nation, pre-filtered to the two nations)
    broadcasts and prunes lineitem BEFORE the orderkey shuffle — the
    one large shuffle joins only surviving lines against orders. The
    customer->nation lookup broadcasts too; the disjunctive nation
    pair predicate is applied after both small joins, then a 4-group
    aggregate. At scale: one fact shuffle, everything else map-side."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    two = t["nation"].where(F.col("n_name").isin("NATION_1", "NATION_2"))
    sup = (
        t["supplier"]
        .join(F.broadcast(two), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(two), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    j = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year, round(CAST(num AS DOUBLE)/CAST(den AS DOUBLE), 4) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                 sum(CASE WHEN n1.n_name='NATION_3' THEN CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4))) ELSE CAST(0 AS DECIMAL(18,4)) END) AS num,
                 sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))) AS den
          FROM lineitem JOIN part ON p_partkey=l_partkey JOIN supplier ON s_suppkey=l_suppkey
               JOIN orders ON o_orderkey=l_orderkey JOIN customer ON c_custkey=o_custkey
               JOIN nation n2 ON c_nationkey=n2.n_nationkey JOIN region ON n2.n_regionkey=r_regionkey
               JOIN nation n1 ON s_nationkey=n1.n_nationkey
          WHERE r_name='ASIA' AND p_type='ECONOMY'
          GROUP BY o_year)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by year. The most selective dim (part, 1/6) broadcasts first
    so the fact shrinks before its one orderkey shuffle; numerator and
    denominator are one conditional aggregation over the same pass
    (never two plans). The share division happens after both decimal
    sums, in double, identically on both engines."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "orders",
                    "customer", "nation", "region")
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    j = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", _dec_rev()).otherwise(zero)).alias("num"),
            F.sum(_dec_rev()).alias("den"),
        )
    )
    return agg.select(
        "o_year",
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 4).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name, o_year, CAST(round(sum(amount),2) AS DOUBLE) AS sum_profit
    FROM (SELECT n.n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))
                 - CAST(p_retailprice/2 AS DECIMAL(18,4))*CAST(l_quantity AS DECIMAL(18,4)) AS amount
          FROM lineitem JOIN part ON p_partkey=l_partkey JOIN supplier ON s_suppkey=l_suppkey
               JOIN orders ON o_orderkey=l_orderkey JOIN nation n ON s_nationkey=n.n_nationkey
          WHERE p_name LIKE '%red%')
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by nation and year.
    The p_name LIKE filter broadcasts with part and prunes the fact
    before its single orderkey shuffle; supplier->nation broadcasts.
    Profit = revenue - cost computed per row in exact decimal
    (stand-in cost: half retail price x quantity, since partsupp's
    supplycost doesn't exist in the synthetic schema)."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    part = t["part"].where(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    amount = _dec_rev() - (
        (F.col("p_retailprice") / 2).cast("decimal(18,4)") * _dec("l_quantity")
    )
    j = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("n_name", "o_year")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nv AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS value_dec
      FROM lineitem JOIN supplier ON l_suppkey=s_suppkey JOIN nation ON s_nationkey=n_nationkey
      WHERE n_name = 'NATION_5' GROUP BY l_partkey)
    SELECT l_partkey, CAST(round(value_dec,2) AS DOUBLE) AS part_value
    FROM nv WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(sum(value_dec) AS DOUBLE)*0.001 FROM nv)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding more than a fraction of one
    nation's total value. The scalar subquery (global total) is a
    1-row re-aggregation of the SAME per-part aggregate, cross-joined
    (broadcast of one row) as the threshold — the nation-filtered
    lineitem is scanned and shuffled exactly once, not once per side.
    (Stand-in value: extendedprice x quantity for supplycost x
    availqty.) The > compare runs in double on both engines after
    exact decimal sums."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"].where(F.col("n_name") == "NATION_5")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    nv = (
        t["lineitem"]
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value_dec"))
    )
    nv = nv.persist()
    total = nv.agg((F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        nv.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.round(F.col("value_dec"), 2).cast("double").alias("part_value"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM co GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over ALL customers — the left
    outer join keeps zero-order customers (the c_count=0 bucket SQL
    INNER JOIN would silently drop). The orders-side predicate
    pre-filters BEFORE the join (filter inside an outer join's right
    side, not after it, which would turn the join inner). Two
    aggregations: per-customer count shuffles on custkey, then the
    tiny count-of-counts."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].where(F.col("o_orderpriority") != "5-LOW")
    co = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS total_rev
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev FROM supplier JOIN rev ON s_suppkey=l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue. The view
    (revenue per supplier) materializes once via persist; the scalar
    max re-aggregates it and broadcasts back as a 1-row cross join —
    ties keep every supplier at the max (set semantics; a LIMIT 1
    would be nondeterministic under ties). Revenue is rounded in
    decimal BEFORE the max compare so the equality is between
    identical doubles on both engines."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("total_rev"))
        .persist()
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16_parts_supplier_count",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1,4,9,16,25,36,49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each part class.
    NOT IN over a clean-supplier list compiles to a broadcast
    LEFT ANTI join (the excluded set is tiny); the part attribute
    filter broadcasts; then one count-distinct on the pair grain.
    (Stand-ins: lineitem pairs for partsupp; negative account balance
    for the complaints predicate.)"""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    part = t["part"].where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        _pairs(t)
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if small orders stopped. The correlated
    per-part average decorrelates into one groupBy(partkey) aggregate
    joined back — and since only Brand#3/SMALL parts matter, the
    brand filter broadcasts into BOTH the fact scan and the average's
    input, so neither side aggregates parts that can't qualify. avg of
    integer-valued quantities is exact in double (sums < 2^53), safe
    to compare across engines without decimal."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    part = t["part"].where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = t["lineitem"].join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(pa), F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand='Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand='Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the disjunctive-predicate join. The OR spans both
    tables, so no single conjunct pushes to either scan — but the
    part-only implication (brand in the 3 listed, size <= 35)
    broadcasts as a reduced dim, and the residual OR evaluates
    post-join inside codegen. One broadcast join, one scalar agg; the
    fact never shuffles."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    part = t["part"].where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & (F.col("p_size") <= 35)
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 40)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers moving heavy volume of a part line.
    The nested IN decorrelates to a LEFT SEMI join against the
    grouped-HAVING aggregate; the p_name LIKE dim broadcasts into the
    fact before its (suppkey, partkey) shuffle. Supplier x nation is
    dim-sized and the semi-join output is tiny, so the only large
    exchange is the one grouped aggregate. (Stand-in: shipped-quantity
    threshold for the availqty > half-demand predicate.)"""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    part = t["part"].where(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
      JOIN nation ON s_nationkey = n_nationkey
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n_name = 'NATION_2' AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the double correlated EXISTS / NOT EXISTS.
    Instead of two more self-joins of the fact, both subqueries
    decorrelate into ONE per-order aggregate — distinct suppliers and
    distinct flagged suppliers — joined back on orderkey:
    EXISTS(other supplier)         <=> n_supp > 1
    NOT EXISTS(other 'R' supplier) <=> n_r_supp = 1   (l1 itself is R)
    Three passes over lineitem total (candidate lines + one stats agg)
    versus the SQL's four; all on the same orderkey partitioning.
    (Adapted predicate: returnflag 'R' stands in for the missing
    receiptdate > commitdate.)"""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "orders")
    li = t["lineitem"]
    stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_r_supp"),
    )
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"].where(F.col("n_name") == "NATION_2")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    cand = (
        li.where(F.col("l_returnflag") == "R")
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"].where(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        cand.join(stats, F.col("ok") == F.col("l_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
                  WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE')),
    thr AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)/count(*) AS avg_bal
            FROM pool WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))),2) AS DOUBLE) AS totacctbal
    FROM pool, thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-dormant customers. The global average
    is a 1-row broadcast threshold (sum in exact decimal, divide in
    double — partial-agg order can't perturb it); NOT EXISTS
    decorrelates to a LEFT ANTI join against recent orders, with the
    date predicate pushed into the anti side's scan. (Adapted:
    market-segment list for the phone-prefix list, recent-orders
    cutoff so dormancy is non-degenerate when every customer has
    lifetime orders.)"""
    t = load_tables(spark, sf_dir, "customer", "orders")
    pool = t["customer"].where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE")
    ).select("c_custkey", "c_mktsegment", "c_acctbal").persist()
    thr = (
        pool.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )
