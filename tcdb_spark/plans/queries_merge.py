"""Write-side MERGE semantics (SURVEY.md §2.8) oracle-checked on the
``events`` table: a keyed upsert expressed as the full-outer-join plan the
engine uses when no lakehouse MERGE is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.operators.merge import cascade_delete, delete_where, merge
from tcdb_spark.plans.catalog import load_tables, register


def _current_incoming(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = load_tables(spark, sf_dir, "events")["events"]
    current = e.where(F.col("event_id") % 2 == 0)
    # value+1 is exact in binary floating point (no cross-engine rounding
    # half-case hazard the way round(v*1.1, 2) has)
    incoming = e.where(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") + F.lit(1.0)
    )
    return current, incoming


@register(
    "merge_upsert",
    oracle="""
    -- inc mirrors the engine's DETERMINISTIC source dedup (duplicate
    -- natural keys are real — shadow-sweep finding): rank duplicates by
    -- the descending tuple of non-key columns, keep rank 1
    WITH cur AS (SELECT * FROM events WHERE event_id % 2 = 0),
         inc AS (SELECT event_id, ts, user_id, event_type,
                        value + 1.0 AS value
                 FROM (SELECT *, row_number() OVER (
                           PARTITION BY event_id
                           ORDER BY ts DESC NULLS LAST, user_id DESC NULLS LAST,
                                    event_type DESC NULLS LAST,
                                    value DESC NULLS LAST, props DESC NULLS LAST
                       ) AS rn
                       FROM events WHERE event_id % 3 = 0)
                 WHERE rn = 1)
    SELECT coalesce(c.event_id, i.event_id) AS event_id,
           CASE WHEN i.event_id IS NOT NULL THEN i.ts ELSE c.ts END AS ts,
           CASE WHEN i.event_id IS NOT NULL THEN i.user_id ELSE c.user_id END AS user_id,
           CASE WHEN i.event_id IS NOT NULL THEN i.event_type ELSE c.event_type END AS event_type,
           CASE WHEN i.event_id IS NOT NULL THEN i.value ELSE c.value END AS value
    FROM cur c FULL OUTER JOIN inc i ON c.event_id = i.event_id
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-key MERGE: matched+changed -> update, unmatched-right ->
    insert, left-only -> keep (tcdb/etl/process_obs.py:70-91 semantics as
    one full-outer-join plan). The oracle's CASE-by-presence is equivalent
    because unchanged matches take identical incoming values."""
    current, incoming = _current_incoming(spark, sf_dir)
    out = merge(current, incoming, keys=["event_id"])
    return out.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "merge_delete_old",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE NOT (event_type = 'error'
               AND ts < (SELECT max(ts) - INTERVAL 48 HOUR FROM events))
    """,
)
def merge_delete_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE (removeOldInvests shape, tcdb/pipeline/routines.py:33-65):
    drop stale rows of one class, keep everything else."""
    e = load_tables(spark, sf_dir, "events")["events"]
    ref = e.agg(F.max("ts").alias("__max_ts"))
    tagged = e.crossJoin(F.broadcast(ref))
    pred = (F.col("event_type") == "error") & (
        F.col("ts") < F.col("__max_ts") - F.expr("INTERVAL 48 HOURS")
    )
    return delete_where(tagged, pred).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "merge_cascade_delete",
    oracle="""
    WITH doomed AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderstatus = 'F' AND o_totalprice < 5000)
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey NOT IN (SELECT o_custkey FROM doomed)
    """,
)
def merge_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-table delete replacing FK cascade (ORM cascade
    tcdb/models/storms.py:30-31): delete parents matching a predicate,
    anti-join children against the deleted keys."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    child = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    pred = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 5000)
    _, children = cascade_delete(
        t["orders"], {"lineitem": (child, "o_custkey")}, pred, "o_custkey"
    )
    return children["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "dedup_file_content",
    oracle="""
    WITH versions AS (
        SELECT doc_id, source, text,
               lag(md5(text)) OVER (PARTITION BY source ORDER BY doc_id) AS prev_hash
        FROM documents
    )
    SELECT doc_id, source
    FROM versions
    WHERE prev_hash IS NULL OR md5(text) <> prev_hash
    """,
)
def dedup_file_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-ledger dedup: keep only versions whose content hash differs
    from the previous version in sequence (tcdb/pipeline/fs_utils.py:23-56
    ``removeDuplicateFiles``) — lag(hash) over the version order."""
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    h = F.md5(F.col("text").cast("binary"))
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        d.withColumn("__h", h)
        .withColumn("__prev", F.lag("__h").over(w))
        .where(F.col("__prev").isNull() | (F.col("__h") != F.col("__prev")))
        .select("doc_id", "source")
    )


@register(
    "cdc_apply",
    oracle="""
    WITH cur AS (
        SELECT event_id, value AS v FROM events WHERE event_id % 2 = 0
    ), feed AS (
        SELECT event_id, 1 AS seq, 'U' AS op, value + 1.0 AS v
        FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT event_id, 2 AS seq, 'D' AS op, NULL AS v
        FROM events WHERE event_id % 6 = 0
        UNION ALL
        SELECT event_id + 10000000 AS event_id, 1 AS seq, 'I' AS op, 2.5 AS v
        FROM events WHERE event_id % 5 = 0
    ), latest AS (
        SELECT event_id, op, v FROM (
            SELECT f.*, row_number() OVER (
                PARTITION BY event_id
                ORDER BY seq DESC,
                         CASE op WHEN 'D' THEN 0 WHEN 'U' THEN 1 ELSE 2 END,
                         v DESC NULLS LAST
            ) AS rn FROM feed f
        ) WHERE rn = 1
    ), ups AS (
        SELECT event_id, v FROM latest WHERE op IN ('I','U')
    ), merged AS (
        SELECT coalesce(c.event_id, u.event_id) AS event_id,
               CASE WHEN u.event_id IS NOT NULL THEN u.v ELSE c.v END AS v
        FROM cur c FULL OUTER JOIN ups u ON c.event_id = u.event_id
    )
    SELECT m.event_id, m.v AS value
    FROM merged m
    WHERE NOT EXISTS (
        SELECT 1 FROM latest d
        WHERE d.op = 'D' AND d.event_id = m.event_id
    )
    """,
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-`APPLY CHANGES INTO` semantics over vanilla parquet
    (`operators/merge.py apply_cdc`): an out-of-order CDC feed —
    updates at seq 1, later deletes at seq 2 overriding half of them,
    inserts of brand-new keys — collapses to the latest op per key
    (one batch-sized window), upserts through MERGE, and anti-joins
    the deletes.  The same key can appear as U then D in one batch and
    the destructive op wins, which is what replaying a CDC log
    at-least-once requires.  The oracle replays the identical
    reduction as SQL.
    """
    from tcdb_spark.operators.merge import apply_cdc

    e = load_tables(spark, sf_dir, "events")["events"]
    cur = e.where(F.col("event_id") % 2 == 0).select("event_id", F.col("value"))
    feed = (
        e.where(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            (F.col("value") + F.lit(1.0)).alias("value"),
        )
        .unionByName(
            e.where(F.col("event_id") % 6 == 0).select(
                "event_id",
                F.lit(2).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("value"),
            )
        )
        .unionByName(
            e.where(F.col("event_id") % 5 == 0).select(
                (F.col("event_id") + F.lit(10000000)).alias("event_id"),
                F.lit(1).alias("seq"),
                F.lit("I").alias("op"),
                F.lit(2.5).alias("value"),
            )
        )
    )
    return apply_cdc(cur, feed, keys=["event_id"]).select("event_id", "value")


@register(
    "cdc_apply_soft",
    oracle="""
    WITH cur AS (
        SELECT event_id, value AS v, CAST(0 AS BIGINT) AS seq, FALSE AS del
        FROM events WHERE event_id % 2 = 0
    ), feed AS (
        SELECT event_id, CAST(1 AS BIGINT) AS seq, 'U' AS op, value + 1.0 AS v
        FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT event_id, CAST(2 AS BIGINT) AS seq, 'D' AS op, NULL AS v
        FROM events WHERE event_id % 6 = 0
        UNION ALL
        SELECT event_id + 10000000 AS event_id, CAST(1 AS BIGINT) AS seq,
               'I' AS op, 2.5 AS v
        FROM events WHERE event_id % 5 = 0
    ), latest AS (
        -- mirrors the engine's deterministic latest-op-per-key window:
        -- seq DESC, destructive op first, then payload DESC as the
        -- duplicate-natural-key tie-break (shadow-sweep finding)
        SELECT event_id, v, seq, (op = 'D') AS del FROM (
            SELECT f.*, row_number() OVER (
                PARTITION BY event_id
                ORDER BY seq DESC,
                         CASE op WHEN 'D' THEN 0 WHEN 'U' THEN 1 ELSE 2 END,
                         v DESC NULLS LAST
            ) AS rn FROM feed f
        ) WHERE rn = 1
    ), merged AS (
        -- per-ROW full outer (the engine is MERGE-shaped: duplicate
        -- target keys each match the one latest feed row); the feed's
        -- seq is always > the bootstrap seq 0, so presence == applied
        SELECT coalesce(c.event_id, l.event_id) AS event_id,
               CASE WHEN l.event_id IS NOT NULL THEN l.v ELSE c.v END AS v,
               CASE WHEN l.event_id IS NOT NULL THEN l.seq ELSE c.seq END AS seq,
               CASE WHEN l.event_id IS NOT NULL THEN l.del ELSE c.del END AS del
        FROM cur c FULL OUTER JOIN latest l ON c.event_id = l.event_id
    )
    SELECT event_id, v AS value, seq AS applied_seq
    FROM merged WHERE NOT del
    """,
)
def cdc_apply_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-delete CDC apply (`operators/merge.py apply_cdc_soft`):
    tombstones + a per-row applied-sequence guard make the apply
    correct under out-of-order delivery ACROSS batches, not just
    within one (a hard delete leaves nothing to compare a late stale
    update against — the tombstone does).  The oracle states the
    fixpoint directly: per key, the max-sequence op wins
    (destructive on ties), and tombstoned keys disappear from the
    live view.  Same feed as `cdc_apply`, so the two rows together
    document exactly what the soft variant buys.
    """
    from tcdb_spark.operators.merge import apply_cdc_soft, cdc_bootstrap

    e = load_tables(spark, sf_dir, "events")["events"]
    cur = cdc_bootstrap(
        e.where(F.col("event_id") % 2 == 0).select("event_id", "value")
    )
    feed = (
        e.where(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            F.lit(1).cast("long").alias("seq"),
            F.lit("U").alias("op"),
            (F.col("value") + F.lit(1.0)).alias("value"),
        )
        .unionByName(
            e.where(F.col("event_id") % 6 == 0).select(
                "event_id",
                F.lit(2).cast("long").alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("value"),
            )
        )
        .unionByName(
            e.where(F.col("event_id") % 5 == 0).select(
                (F.col("event_id") + F.lit(10000000)).alias("event_id"),
                F.lit(1).cast("long").alias("seq"),
                F.lit("I").alias("op"),
                F.lit(2.5).alias("value"),
            )
        )
    )
    out = apply_cdc_soft(cur, feed, keys=["event_id"])
    return out.where(~F.col("__deleted")).select(
        "event_id", "value", F.col("seq").alias("applied_seq")
    )


@register(
    "warehouse_skipping_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id BETWEEN 3 AND 5
    """,
)
def warehouse_skipping_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stats point lookup through the REAL warehouse path: events
    land in a versioned warehouse table range-clustered on user_id with
    stats collected at commit (write(stats_cols=...)), then a keyed
    range lookup goes through read_skipping — provably-disjoint files
    are pruned from the file list BEFORE the scan plans (the
    Delta/Iceberg stats-in-log analog; at 10^5 files per table that is
    a driver-side metadata lookup instead of 10^5 footer reads).  The
    query RAISES unless files were actually skipped, so a layout or
    stats regression turns this correctness row red instead of silently
    degrading to a full scan; the residual row-level filter keeps the
    result exact regardless, which is what the value-hash oracle
    certifies."""
    import atexit
    import shutil
    import tempfile

    from tcdb_spark.sources.warehouse import Warehouse

    e = load_tables(spark, sf_dir, "events")["events"].select(
        "event_id", "user_id", "event_type", "value"
    )
    # tmp outlives the returned (lazy) plan — cleaned at process exit, so
    # the caller sees the REAL pruned scan, not a pre-collected local
    # relation that would blind the executed-plan audit
    tmp = tempfile.mkdtemp(prefix="tcdb_skip_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    wh = Warehouse(spark, tmp)
    wh.write(
        "events",
        e.repartitionByRange(8, "user_id"),
        stats_cols=["user_id"],
    )
    pruned, info = wh.read_skipping("events", {"user_id": (3, 5)})
    if not (0 < info["files_read"] < info["files_total"]):
        raise AssertionError(
            f"file skipping regressed: read {info['files_read']} of "
            f"{info['files_total']} files for a narrow key range"
        )
    return pruned.select("event_id", "user_id", "event_type", "value")


@register(
    "merge_sync_snapshot",
    oracle="""
    WITH cur AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    inc AS (
        SELECT k, CASE WHEN k % 5 = 0 THEN cents + 1000 ELSE cents END AS cents
        FROM cur WHERE k % 3 <> 0
        UNION ALL
        SELECT k + 10000000 AS k, CAST(123 AS BIGINT) AS cents
        FROM cur WHERE k % 7 = 0
    )
    SELECT i.k, i.cents, c.status
    FROM inc i LEFT JOIN cur c ON c.k = i.k
    """,
)
def merge_sync_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authoritative-snapshot MERGE (upsert + delete-unmatched, the
    WHEN NOT MATCHED BY SOURCE clause) driven by a deterministic
    incoming feed: one third of current keys vanish (deleted), every
    5th gets a price bump (updated), every 7th spawns a new key
    (inserted, current-only columns NULL).  Money is integer CENTS
    end-to-end — cross-engine float rounding never enters (DEVNOTES
    hazard family).  The oracle is the closed-form outcome (incoming
    keys with coalesced columns), so the hash match attests all three
    clauses at once.  Plan: the upsert full-outer join and the
    delete-unmatched semi join share the key shuffle."""
    from tcdb_spark.operators.merge import merge_sync

    o = load_tables(spark, sf_dir, "orders")["orders"]
    cur = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).persist()
    inc = cur.where(F.col("k") % 3 != 0).select(
        "k",
        F.when(F.col("k") % 5 == 0, F.col("cents") + 1000)
        .otherwise(F.col("cents"))
        .alias("cents"),
    ).unionByName(
        cur.where(F.col("k") % 7 == 0).select(
            (F.col("k") + 10000000).alias("k"), F.lit(123).cast("bigint").alias("cents")
        )
    )
    out = merge_sync(cur, inc, ["k"])
    return out.select("k", "cents", "status")


@register(
    "snapshot_diff",
    oracle="""
    WITH cur AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus AS status
        FROM orders
    ),
    nxt AS (
        SELECT k, CASE WHEN k % 10 = 2 THEN cents + 5 ELSE cents END AS cents,
               status
        FROM cur WHERE k % 10 <> 1
        UNION ALL
        SELECT k + 20000000 AS k, CAST(777 AS BIGINT) AS cents, 'N' AS status
        FROM cur WHERE k % 10 = 3
    )
    SELECT coalesce(c.k, n.k) AS k,
           CASE WHEN c.k IS NULL THEN 'insert'
                WHEN n.k IS NULL THEN 'delete'
                WHEN c.cents IS DISTINCT FROM n.cents
                  OR c.status IS DISTINCT FROM n.status THEN 'update'
           END AS change_type
    FROM cur c FULL OUTER JOIN nxt n ON c.k = n.k
    WHERE (CASE WHEN c.k IS NULL THEN 'insert'
                WHEN n.k IS NULL THEN 'delete'
                WHEN c.cents IS DISTINCT FROM n.cents
                  OR c.status IS DISTINCT FROM n.status THEN 'update'
           END) IS NOT NULL
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two table states (operators/merge
    .frame_diff): insert/update/delete classification through ONE
    null-safe full-outer join on the key — the change-data-feed
    primitive (Warehouse.diff's engine) attested with a closed-form
    oracle: 10% of keys deleted, 10% price-bumped, 10% spawning new
    keys.  Unchanged keys emit nothing, so the diff output is
    proportional to the CHANGE volume, not the table size; when both
    states are bucketed on the key the join is co-partitioned and
    exchange-free (pinned in tests/test_warehouse_diff.py).  Money is
    integer cents — no float compare anywhere."""
    from tcdb_spark.operators.merge import frame_diff

    o = load_tables(spark, sf_dir, "orders")["orders"]
    cur = o.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderstatus").alias("status"),
    ).persist()
    nxt = cur.where(F.col("k") % 10 != 1).select(
        "k",
        F.when(F.col("k") % 10 == 2, F.col("cents") + 5)
        .otherwise(F.col("cents"))
        .alias("cents"),
        "status",
    ).unionByName(
        cur.where(F.col("k") % 10 == 3).select(
            (F.col("k") + 20000000).alias("k"),
            F.lit(777).cast("bigint").alias("cents"),
            F.lit("N").alias("status"),
        )
    )
    return frame_diff(cur, nxt, ["k"])
