"""Completeness entries: the full window-rank family (SURVEY.md §2.7
note: "expose in engine API"), outer/semi/anti join family (the implicit
outer-join semantics of §2.4/§2.8), distinct aggregation, and rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import load_tables, register


@register(
    "window_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(lag(o_totalprice) OVER w, 2) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 5
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / running sum / lag in one window
    spec — the §2.7 rank family exposed end to end."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running_total"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        )
        .where(F.col("rn") <= 5)
    )


@register(
    "join_outer_family",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS INTEGER) AS customer_missing
    FROM customer c
    FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 4
    """,
)
def join_outer_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join + null-side accounting — the explicit form of the
    MERGE's unmatched-left/unmatched-right semantics (§2.8)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"].alias("c"), t["orders"].alias("o")
    j = c.join(o, F.col("c.c_custkey") == F.col("o.o_custkey"), "full_outer")
    return j.groupBy(
        F.coalesce(F.col("c.c_custkey"), F.col("o.o_custkey")).alias("custkey"),
        F.col("c.c_name").alias("c_name"),
        F.when(F.col("c.c_custkey").isNull(), 1).otherwise(0).cast("int").alias("customer_missing"),
    ).agg(F.count(F.col("o.o_orderkey")).alias("n_orders"))


@register(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS side FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS side FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti — the reference's one_or_none existence gates
    (tcdb/etl/atcf_forecasts.py:75-82) as set operations."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    orders = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    has = t["customer"].join(orders, on="c_custkey", how="left_semi").select(
        "c_custkey", F.lit("has_orders").alias("side")
    )
    not_has = t["customer"].join(orders, on="c_custkey", how="left_anti").select(
        "c_custkey", F.lit("no_orders").alias("side")
    )
    return has.unionByName(not_has)


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct aggregation (Spark expands to a partial
    dedup + final agg; the approximate twin at 100 TB is
    approx_count_distinct, not oracle-able bit-for-bit)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup_counts",
    oracle="""
    SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy counts (region -> nation -> total) — one shuffle
    for the whole drill-down path (§2.5 grouping-sets superset)."""
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    j = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    return j.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n"))


@register(
    "join_asof_nearest",
    oracle="""
    -- rid, not event_id, as the dedup partition: event_id is a natural
    -- key that CAN repeat (shadow-sweep finding) and the engine is
    -- per-ROW, so the oracle must be too
    WITH p AS (SELECT row_number() OVER () AS rid, event_id, user_id, ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
    pairs AS (
        SELECT p.rid, p.event_id, p.user_id, p.ts, c.click_ts,
               abs(epoch(p.ts) - epoch(c.click_ts)) AS d,
               CASE WHEN c.click_ts <= p.ts THEN 0 ELSE 1 END AS side
        FROM p LEFT JOIN c USING (user_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN d <= 6 * 3600 THEN click_ts END AS click_ts
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY rid ORDER BY d ASC, side ASC) = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join with a 6 h tolerance: per purchase,
    the closest click in EITHER direction (ties resolve backward),
    nulled when farther than the threshold — exactly the reference's
    time_threshold track matching (tcdb/etl/syntracks.py:330-360).
    Same union+window plan as backward/forward: one shuffle on the
    key, both direction frames over a single sort."""
    from tcdb_spark.operators.joins import asof_join

    e = load_tables(spark, sf_dir, "events")["events"]
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts", "click_ts", ["click_ts"],
        direction="nearest", tolerance_hours=6.0,
    )
    return out.select("event_id", "user_id", "ts", "click_ts")


@register(
    "join_asof_nearest_bucketed",
    oracle="""
    -- rid, not event_id, as the dedup partition: event_id is a natural
    -- key that CAN repeat (shadow-sweep finding) and the engine is
    -- per-ROW, so the oracle must be too
    WITH p AS (SELECT row_number() OVER () AS rid, event_id, user_id, ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
    pairs AS (
        SELECT p.rid, p.event_id, p.user_id, p.ts, c.click_ts,
               abs(epoch(p.ts) - epoch(c.click_ts)) AS d,
               CASE WHEN c.click_ts <= p.ts THEN 0 ELSE 1 END AS side
        FROM p LEFT JOIN c USING (user_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN d <= 6 * 3600 THEN click_ts END AS click_ts
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY rid ORDER BY d ASC, side ASC) = 1
    """,
)
def join_asof_nearest_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resistant twin of `join_asof_nearest` — identical
    semantics and oracle through the bucketed operator's
    direction='nearest' path (VERDICT r6 #4: per-(key, 24h bucket)
    windows with BOTH carried boundaries — last-before at bucket start,
    earliest-after at bucket end — so a megahot entity splits across
    time buckets in either direction instead of owning one reducer)."""
    from tcdb_spark.operators.joins import asof_join_bucketed

    e = load_tables(spark, sf_dir, "events")["events"]
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join_bucketed(
        purchases, clicks, ["user_id"], "ts", "click_ts", ["click_ts"],
        bucket_hours=24.0, direction="nearest", tolerance_hours=6.0,
    )
    return out.select("event_id", "user_id", "ts", "click_ts")


@register(
    "set_ops_users",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ('click','view')),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT 'both' AS cohort, user_id FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    UNION ALL
    SELECT 'browse_only', user_id FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface: browse-vs-purchase cohort split.
    Both compile to the same physical shapes as semi/anti joins (hash
    join on the distinct sets) — catalogued so the set-operator API
    itself is covered, not just its join spelling. At scale each side
    is one distinct (map-side partial) and one co-partitioned join;
    the 'both'/'browse_only' union is plan-level concat, no shuffle."""
    e = load_tables(spark, sf_dir, "events")["events"]
    a = e.where(F.col("event_type").isin("click", "view")).select("user_id").distinct()
    b = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    both = a.intersect(b).select(F.lit("both").alias("cohort"), "user_id")
    only = a.exceptAll(b).select(F.lit("browse_only").alias("cohort"), "user_id")
    return both.unionByName(only)


@register(
    "join_fuzzy_match",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk FROM part
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    """,
)
def join_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs share a blocking key (the
    part-type word), edit distance 1-2 confirms the match — the standard
    entity-resolution shape (block -> equi-join -> verify) that keeps
    approximate string matching off the all-pairs cliff. `levenshtein`
    is a JVM built-in with identical integer semantics in DuckDB.

    Scale shape: the self-join shuffles on blk only; block sizes are
    bounded by the name vocabulary here, and at crawl scale a hot-block
    df-cap (drop blocks with document frequency > cap, exactly like
    NGRAM_DF_CAP in the shingle joins) bounds the pair explosion.
    """
    p = load_tables(spark, sf_dir, "part")["part"]
    p = p.select(
        "p_partkey", "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("blk")
    )
    a = p.alias("a")
    b = p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_partkey") < F.col("b.p_partkey")))
        .where(lev.between(1, 2))
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("int").alias("dist"),
        )
    )


_SESS_IV_SQL = """
    lagged AS (
        SELECT user_id, ts,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_s,
               event_id
        FROM events
    ),
    sessed AS (
        SELECT user_id, ts,
               sum(CASE WHEN coalesce(gap_s, 0) > 1800 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM lagged
    ),
    iv AS (
        SELECT user_id, session_id,
               CAST(floor(min(epoch(ts))) AS BIGINT) AS s,
               CAST(floor(max(epoch(ts))) AS BIGINT) AS e
        FROM sessed GROUP BY user_id, session_id
    )
"""


@register(
    "interval_overlap_join",
    oracle=(
        "WITH " + _SESS_IV_SQL + """
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
               AS total_overlap_s
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1, 2
    """
    ),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: which user pairs had concurrent
    sessions, and for how long — the interval x interval join class
    (conflict detection, co-presence, resource contention) that
    equi-join engines can't express directly and naive engines run as
    an O(n^2) range cross.

    Scale shape: each session interval explodes into its coarse
    time-bin cover (1 h bins; a session spans few), candidates meet
    through a bin EQUI-join — the shuffle key is time locality, so only
    intervals sharing an hour ever pair — and the exact overlap
    predicate verifies candidates.  Bin-crossing duplicates are removed
    by a distinct on the pair key BEFORE aggregation.  Bin width is the
    skew lever: at 100 TB you pick it near the median interval length
    (and df-cap pathological hot bins, the textdedup device).  Overlap
    seconds are INTEGER math end-to-end (floored epochs) — no float
    hazard anywhere.  The DuckDB oracle runs the honest range-predicate
    join over the identical sessionized intervals (reusing the
    sessionize_events CTE), so the hash match attests the bin cover
    loses no pair and adds no duplicate."""
    from tcdb_spark.operators.joins import interval_overlap_pairs
    from tcdb_spark.operators.skew import sessionize

    e = load_tables(spark, sf_dir, "events")["events"]
    sess = sessionize(e, ["user_id"], "ts", gap_minutes=30.0, tiebreak="event_id")
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min(F.unix_timestamp("ts")).alias("s"),
        F.max(F.unix_timestamp("ts")).alias("e"),
    )
    cand = interval_overlap_pairs(iv, "user_id", "session_id", "s", "e", bin_s=3600)
    return cand.groupBy(
        F.col("key_a").alias("user_a"), F.col("key_b").alias("user_b")
    ).agg(
        F.count("*").alias("n_overlaps"),
        F.sum("ov").cast("bigint").alias("total_overlap_s"),
    )
