"""Training-data assembly and graph-analytics operators (SURVEY.md
§2.12 extensions): per-user conversation assembly (SFT data prep),
contrastive negative-pair sampling without a cross join, a cogrouped
applyInPandas as-of alignment (the one §2.11 Arrow surface the catalog
did not yet exercise), robust MAD outlier screening, and
fixed-iteration PageRank over the customer-supplier bipartite graph.

Cross-engine compare rules follow catalog.py: integer emission where
possible, md5 fingerprints instead of nested arrays, rounding on every
float that is the result of an order-dependent sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcdb_spark.plans.catalog import load_tables, register


@register(
    "conversation_assembly",
    oracle="""
    SELECT user_id,
           count(*) AS n_turns,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           md5(string_agg(event_type || ':' || CAST(event_id AS VARCHAR),
                          '|' ORDER BY ts, event_id)) AS convo_fp
    FROM events
    GROUP BY user_id
    """,
)
def conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble per-user event streams into ordered conversation
    sequences — the grouping/ordering step of SFT-style training-data
    prep (turn lists per dialogue id).  One shuffle on user_id;
    ``collect_list`` + ``array_sort`` orders turns inside each group
    without a global sort, and the ordered sequence is emitted as an
    md5 fingerprint so the oracle compare is exact without nested-type
    hashing.  At 100 TB the per-key turn list is bounded by dialogue
    length (not corpus size), so the collect stays executor-sized;
    skewed power-users would use the §2.5 salted two-phase shape.
    """
    ev = load_tables(spark, sf_dir, "events")["events"]
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    fp = F.md5(
        F.array_join(
            F.transform(
                seq,
                lambda s: F.concat_ws(
                    ":", s["event_type"], s["event_id"].cast("string")
                ),
            ),
            "|",
        )
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        fp.alias("convo_fp"),
    )


NEG_K = 4  # negatives per anchor
NEG_STEP = 97  # ring stride (coprime with any realistic corpus size)


@register(
    "negative_pair_sample",
    oracle=f"""
    WITH n AS (SELECT count(*) AS cnt FROM embeddings),
    pairs AS (
        SELECT a.vec_id, t.j,
               (a.vec_id + t.j * {NEG_STEP}) % (SELECT cnt FROM n) AS neg_id,
               a.label
        FROM embeddings a
        CROSS JOIN (VALUES (1),(2),(3),(4)) AS t(j)
    )
    SELECT p.vec_id, CAST(p.j AS INTEGER) AS j, p.neg_id,
           p.label, e.label AS neg_label
    FROM pairs p JOIN embeddings e ON p.neg_id = e.vec_id
    WHERE e.label <> p.label AND p.neg_id <> p.vec_id
    """,
)
def negative_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling without a cross join: each anchor
    takes ``NEG_K`` pseudo-random partners on a deterministic ring
    (anchor_id + j*stride mod N), then one equi-join resolves partner
    labels and same-label accidental positives are filtered out.

    The naive formulation is anchors × corpus (quadratic — the thing
    that dies first at 100 TB); the ring turns it into O(K·N) rows and
    a single equi-join on vec_id, and the integer-only partner math is
    reproducible across engines and runs.  The corpus count enters the
    plan as a broadcast 1-row aggregate, not a driver-side collect.
    """
    from tcdb_spark.operators.packing import negative_pairs

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return negative_pairs(emb, "vec_id", "label", k=NEG_K, step=NEG_STEP)


@register(
    "cogroup_align",
    oracle="""
    WITH a AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT user_id, ts,
               max(event_id) AS b_event_id,
               arg_max("value", event_id) AS b_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT a.user_id, a.event_id, a.ts, b.b_event_id, b.b_value
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def cogroup_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user as-of alignment of two event streams via
    ``cogroup().applyInPandas`` — the cogrouped-map Arrow surface
    (SURVEY.md §2.11), checked against DuckDB's native ASOF LEFT JOIN.

    Each click is annotated with the user's most recent purchase at or
    before it.  The production-recommended plan for this exact
    semantics is the built-in sort-based as-of join
    (``operators/joins.py as_of_join``, catalog ``join_asof``) — this
    entry exists to pin the cogroup API: both inputs shuffle once on
    the group key, pandas sees the two frames per key already aligned,
    and ``pd.merge_asof`` runs per group inside an Arrow batch.  The
    purchase side is pre-deduplicated to one row per (user, ts) with a
    deterministic arg-max so tie resolution cannot flap between
    engines.
    """
    import pandas as pd

    ev = load_tables(spark, sf_dir, "events")["events"]
    a = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    b = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("b_event_id"),
            F.max_by("value", "event_id").alias("b_value"),
        )
        .select("user_id", "ts", "b_event_id", "b_value")
    )

    def align(key, adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        adf = adf.sort_values(["ts", "event_id"])
        if len(adf) == 0:
            return pd.DataFrame(
                columns=["user_id", "event_id", "ts", "b_event_id", "b_value"]
            )
        if len(bdf) == 0:
            out = adf.assign(b_event_id=pd.Series(dtype="Int64"), b_value=float("nan"))
            return out[["user_id", "event_id", "ts", "b_event_id", "b_value"]]
        bdf = bdf.sort_values("ts")[["ts", "b_event_id", "b_value"]]
        out = pd.merge_asof(adf, bdf, on="ts", direction="backward")
        out["b_event_id"] = out["b_event_id"].astype("Int64")
        return out[["user_id", "event_id", "ts", "b_event_id", "b_value"]]

    return (
        a.groupBy("user_id")
        .cogroup(b.groupBy("user_id"))
        .applyInPandas(
            align,
            schema="user_id long, event_id long, ts timestamp, "
            "b_event_id long, b_value double",
        )
    )


MAD_K = 3.0  # outlier threshold in MAD units


@register(
    "mad_outlier_filter",
    oracle=f"""
    WITH med AS (
        SELECT source, median(n_chars) AS med
        FROM documents GROUP BY source
    ), mad AS (
        SELECT d.source, median(abs(d.n_chars - m.med)) AS mad
        FROM documents d JOIN med m USING (source)
        GROUP BY d.source
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(any_value(m.med), 1) AS med_chars,
           round(any_value(x.mad), 1) AS mad_chars,
           CAST(sum(CASE WHEN abs(d.n_chars - m.med) > {MAD_K} * x.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d
    JOIN med m USING (source)
    JOIN mad x USING (source)
    GROUP BY d.source
    """,
)
def mad_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier screening on document length: median +
    median-absolute-deviation, flagging docs beyond ``MAD_K`` MADs —
    the length-filter families in CCNet/Gopher-style curation use
    exactly this statistic because means are destroyed by the long
    tail.  Exact ``percentile`` needs two passes by nature (the second
    median is over residuals from the first); both aggregate to one
    20-row stats frame that re-enters as a broadcast join, so the
    documents table is scanned, never shuffled on a data-dependent
    key.  At 100 TB swap ``percentile`` for ``approx_percentile`` —
    same plan shape, single-pass sketches.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"].select(
        "source", "n_chars"
    )
    med = d.groupBy("source").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    mad = (
        d.join(F.broadcast(med), "source")
        .groupBy("source")
        .agg(F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad"))
    )
    stats = med.join(mad, "source")
    return (
        d.join(F.broadcast(stats), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            # med/mad are broadcast-joined per-source constants: min is
            # the order-free read of a constant column (determinism audit)
            F.round(F.min("med"), 1).alias("med_chars"),
            F.round(F.min("mad"), 1).alias("mad_chars"),
            F.sum(
                F.when(
                    F.abs(F.col("n_chars") - F.col("med")) > F.lit(MAD_K) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


_PR_EDGES_SQL = """
    SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                    's' || CAST(l.l_suppkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""

_PR_ITER_SQL = """
    p{next} AS (
        SELECT d.node, d.deg,
               0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(s.acc, 0) AS val
        FROM deg d LEFT JOIN (
            SELECT e.dst AS node, sum(p.val / p.deg) AS acc
            FROM e JOIN p{cur} p ON e.src = p.node
            GROUP BY e.dst
        ) s ON d.node = s.node
    )
"""


@register(
    "graph_pagerank",
    oracle=(
        f"WITH e0 AS ({_PR_EDGES_SQL}),\n"
        "e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),\n"
        "deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg\n"
        "        FROM e GROUP BY src),\n"
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),\n"
        "p0 AS (SELECT node, deg, 1.0 / (SELECT n FROM nn) AS val FROM deg),\n"
        + _PR_ITER_SQL.format(cur=0, next=1)
        + ",\n"
        + _PR_ITER_SQL.format(cur=1, next=2)
        + ",\n"
        + _PR_ITER_SQL.format(cur=2, next=3)
        + "\nSELECT node, round(val, 9) AS pr FROM p3"
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-iteration PageRank over the customer-supplier bipartite
    graph (edge = customer ordered from supplier) — the iterative-graph
    shape behind authority scoring of crawl domains in pretraining
    curation.  ``operators/graph.py pagerank``: symmetrized edge list
    persisted once, each iteration one shuffle (contributions
    partial-aggregated map-side on dst), rank state O(|V|) with
    lineage truncation per round.  The DuckDB oracle unrolls the same
    three iterations as a CTE chain; ranks are rounded to 9 decimals
    because the contribution sums are order-dependent in the last ULP.
    """
    from tcdb_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["orders"]
        .join(
            t["lineitem"],
            t["orders"].o_orderkey == t["lineitem"].l_orderkey,
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=3, damping=0.85)
    return pr.select("node", F.round("val", 9).alias("pr"))


NUM_SHARDS = 64  # training shards per epoch

_SHUF_H_SQL = "md5('ep1:' || CAST(doc_id AS VARCHAR))"


@register(
    "training_order_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, {_SHUF_H_SQL} AS hx,
               (ascii(substring({_SHUF_H_SQL}, 1, 1)) * 256
                + ascii(substring({_SHUF_H_SQL}, 2, 1))) % {NUM_SHARDS} AS shard_id
        FROM documents
    )
    SELECT doc_id, CAST(shard_id AS INTEGER) AS shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id
                                   ORDER BY hx, doc_id) AS INTEGER) AS shard_rank
    FROM h
    """,
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed training-order shuffle: every epoch's
    example order must be (a) statistically random, (b) reproducible
    across re-runs/partitionings/cluster sizes, and (c) never a global
    single-partition sort.  The standard two-level device: a seeded
    content hash assigns each doc to one of ``NUM_SHARDS`` shards and
    orders it *within* the shard — one hash-partitioned shuffle plus a
    per-shard window, no global ordering bottleneck.  A trainer reads
    shards in order (or shuffles shard order per epoch) and gets a
    reproducible permutation.  ``rand(seed)`` cannot do this: its values
    change under repartitioning (DEVNOTES hazard family); the md5 device
    is stable by construction.
    """
    from tcdb_spark.operators.packing import training_order

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return training_order(d, "doc_id", n_shards=NUM_SHARDS, seed="ep1")


@register(
    "skew_diagnose",
    oracle="""
    WITH ec AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY user_id),
    dc AS (SELECT source AS k, count(*) AS c FROM documents GROUP BY source)
    SELECT 'events.user_id' AS dim,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_cnt,
           round(max(c) * count(*) / sum(c), 4) AS skew_ratio
    FROM ec
    UNION ALL
    SELECT 'documents.source' AS dim,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_cnt,
           round(max(c) * count(*) / sum(c), 4) AS skew_ratio
    FROM dc
    """,
)
def skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis — the measurement you run BEFORE choosing a
    salted join/agg (§2.5 `salted_join`/`agg_salted_equivalence`):
    per-key cardinality profile collapsed to (n_keys, max key count,
    skew ratio = hottest key vs mean).  A ratio near 1 means hash
    partitioning balances; >> 1 means the hot key dominates a single
    reducer and the salted two-phase shape pays for itself.  One
    partial-aggregated groupBy per analyzed column, each collapsing to
    a single row — at 100 TB this is exactly as expensive as the agg it
    derisks, and cheap relative to a mis-planned shuffle.  The ratio is
    max*n/sum — all-integer inputs, one IEEE division, identical in
    both engines.
    """
    t = load_tables(spark, sf_dir, "events", "documents")

    def prof(df: DataFrame, col: str, dim: str) -> DataFrame:
        c = df.groupBy(col).agg(F.count("*").alias("c"))
        return c.agg(
            F.lit(dim).alias("dim"),
            F.count("*").alias("n_keys"),
            F.max("c").alias("max_cnt"),
            F.round(F.max("c") * F.count("*") / F.sum("c"), 4).alias("skew_ratio"),
        )

    return prof(t["events"], "user_id", "events.user_id").unionByName(
        prof(t["documents"], "source", "documents.source")
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts >= s.s_ts
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel (signup -> first click after it -> first
    purchase after that): each stage is an equi-join on user_id against
    the previous stage's timestamp followed by a min-aggregate, so the
    event table is scanned once per stage and only ever shuffles on
    user_id — the same key every time, which AQE/bucketing can reuse.
    Stage frames shrink monotonically (funnel!), so the later joins are
    broadcast-sized in practice.  `>=` keeps same-instant transitions
    (a signup and click in one batch) inside the funnel, and min() is
    order-independent, so no tiebreak can flap.
    Uses the LAZY ``funnel_plan`` twin so the catalog row carries the
    real declarative plan — plan lint and explain audit the actual
    stage-chain (joins, shuffles, the three 1-row count crosses)
    instead of a pre-materialized local relation.  Production callers
    wanting one-scan-per-stage use ``operators.aggregates.funnel``
    (persist-per-stage eager twin, identical row — pinned in tests).
    """
    from tcdb_spark.operators.aggregates import funnel_plan

    ev = load_tables(spark, sf_dir, "events")["events"]
    return funnel_plan(
        ev,
        "user_id",
        "ts",
        [
            ("n_signup", F.col("event_type") == "signup"),
            ("n_click_after", F.col("event_type") == "click"),
            ("n_purchase_after", F.col("event_type") == "purchase"),
        ],
    )


from tcdb_spark.plans.catalog import ORACLES as _ORACLES  # noqa: E402

_LANG_GUESS_SQL = _ORACLES["text_lang_id"]


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH guesses AS ({_LANG_GUESS_SQL})
    SELECT lang_label, lang_guess, CAST(count(*) AS BIGINT) AS n
    FROM guesses GROUP BY lang_label, lang_guess
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit: confusion matrix of labeled vs
    detected language over the corpus — the accuracy dashboard a
    curation pipeline watches before trusting a lang filter.  Reuses
    the `text_lang_id` plan verbatim (and its oracle as a CTE — one
    definition, two checked queries), then one partial-aggregated
    groupBy on a 25-cell key space: the audit costs one corpus scan no
    matter the scale.
    """
    from tcdb_spark.plans.queries_text import text_lang_id

    guesses = text_lang_id(spark, sf_dir)
    return guesses.groupBy("lang_label", "lang_guess").agg(
        F.count("*").alias("n")
    )


_MINHASH_PAIRS_SQL = _ORACLES["dedup_minhash_lsh"]

_SPLIT_CASE = (
    "CASE WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 < 80 THEN 'train'"
    " WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 < 90 THEN 'val'"
    " ELSE 'test' END"
)


@register(
    "split_leakage_check",
    oracle=f"""
    WITH pairs AS ({_MINHASH_PAIRS_SQL}),
    splits AS (
        SELECT doc_id, {_SPLIT_CASE} AS split FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           CAST(count(*) AS BIGINT) AS n_leaking_pairs
    FROM pairs p
    JOIN splits sa ON p.doc_a = sa.doc_id
    JOIN splits sb ON p.doc_b = sb.doc_id
    WHERE sa.split <> sb.split
    GROUP BY sa.split, sb.split
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit through NEAR duplicates: exact-match
    decontamination (`contamination_check`) misses paraphrased leakage,
    so this composes the MinHash-LSH candidate pairs with the
    deterministic split assignment and counts pairs straddling a split
    boundary — the eval-integrity check run before trusting any
    held-out metric.  Reuses the dedup_minhash_lsh plan and oracle
    verbatim; the split join keys on the real corpus, so synthetic
    planted-dup ids fall out and the audit reports leakage among
    actual documents.  Cost: the LSH candidate generation the
    dedup pipeline already pays, plus two broadcast-sized split joins.
    """
    from tcdb_spark.plans.queries_dedup_near import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)
    d = load_tables(spark, sf_dir, "documents")["documents"]
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bucket = (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 100
    splits = d.select(
        "doc_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return (
        pairs.join(splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")), "doc_a")
        .join(splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")), "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_leaking_pairs"))
    )


_TRI_EDGES_SQL = """
    co AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s,
                  CAST(floor(epoch(o.o_orderdate) / 604800) AS BIGINT) AS wk
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    e AS (SELECT a.c AS u, b.c AS v FROM co a JOIN co b
          ON a.s = b.s AND a.wk = b.wk AND a.c < b.c GROUP BY 1, 2)
"""


@register(
    "graph_triangles",
    oracle=(
        "WITH " + _TRI_EDGES_SQL + """,
    tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    members AS (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
    FROM members GROUP BY node
    """
    ),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the customer co-purchase graph
    (edge = two customers bought from the same supplier in the same
    epoch-week) — the local-clustering signal behind community/spam
    detection on crawl graphs.  ``operators/graph.py triangle_counts``
    is the degree-oriented wedge enumeration: each triangle is found
    once at its (degree, id)-minimal vertex, bounding the wedge join by
    out-degree (O(sqrt|E|) on any graph) instead of the hub-degree^2 a
    naive neighbor self-join pays on power-law graphs.  The DuckDB
    oracle enumerates triangles id-canonically (a<b<c three-way join) —
    a different orientation, the identical triangle set — and explodes
    the three members, so a hash match proves orientation independence.
    Week buckets are integer epoch arithmetic (engines disagree on
    date_trunc week starts, DEVNOTES)."""
    from tcdb_spark.operators.graph import triangle_counts

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    co = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
            F.floor(F.unix_timestamp("o_orderdate") / 604800).cast("bigint").alias("wk"),
        )
        .distinct()
        .persist()
    )
    a, b = co.alias("a"), co.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.supp") == F.col("b.supp"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.cust") < F.col("b.cust")),
        )
        .select(F.col("a.cust").alias("src"), F.col("b.cust").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


@register(
    "hierarchy_roots",
    oracle="""
    WITH RECURSIVE pc AS (
        SELECT c_custkey AS node,
               CASE WHEN CAST(floor(c_custkey / 10) AS BIGINT) >= 1
                    THEN CAST(floor(c_custkey / 10) AS BIGINT) END AS parent
        FROM customer
    ),
    walk AS (
        SELECT node, node AS root, 0 AS depth FROM pc WHERE parent IS NULL
        UNION ALL
        SELECT c.node, w.root, w.depth + 1
        FROM pc c JOIN walk w ON c.parent = w.node
    )
    SELECT node, root, CAST(depth AS BIGINT) AS depth FROM walk
    """,
)
def hierarchy_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive hierarchy resolution — every node of a forest mapped
    to its (root, depth), the org-chart / BOM-explosion / referrer-
    chain primitive Spark has no recursive CTE for.

    ``operators/graph.py tree_roots`` runs POINTER DOUBLING: each round
    self-joins the ancestor table with itself, so known-ancestor
    distance doubles per round and a depth-d forest resolves in
    ceil(log2 d) shuffles — the DuckDB oracle's recursive CTE walks one
    level per iteration (O(d) sequential scans), which is exactly the
    asymmetry that matters when a crawl's redirect chains or a
    filesystem tree run thousands of levels deep.  Lineage truncated
    per round (localCheckpoint); convergence is a scalar count.  The
    fixture forest is the deterministic 10-ary tree parent(c) =
    floor(c/10) over customer keys (depth ~ log10 N, so sf0.1 runs one
    more doubling round than sf0.001 — scale-dependent assumptions
    would fail the two-SF check)."""
    from tcdb_spark.operators.graph import tree_roots

    c = load_tables(spark, sf_dir, "customer")["customer"]
    parents = c.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.floor(F.col("c_custkey") / 10) >= 1,
            F.floor(F.col("c_custkey") / 10).cast("bigint"),
        ).alias("parent"),
    )
    return tree_roots(parents)


@register(
    "hierarchy_rollup",
    oracle="""
    WITH RECURSIVE pc AS (
        SELECT c_custkey AS node,
               CASE WHEN CAST(floor(c_custkey / 10) AS BIGINT) >= 1
                    THEN CAST(floor(c_custkey / 10) AS BIGINT) END AS parent
        FROM customer
    ),
    walk AS (
        SELECT node, node AS root, 0 AS depth FROM pc WHERE parent IS NULL
        UNION ALL
        SELECT c.node, w.root, w.depth + 1
        FROM pc c JOIN walk w ON c.parent = w.node
    )
    SELECT root,
           CAST(count(*) AS BIGINT) AS subtree_size,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM walk GROUP BY root
    """,
)
def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup per root — the BOM-explosion / org-headcount read
    built on hierarchy_roots' pointer-doubled closure: once every node
    knows its root, per-subtree aggregates are ONE groupBy (size and
    max depth here; any additive measure works the same).  The
    recursive-CTE oracle re-walks the tree level by level; the engine
    path is log-rounds + a single aggregate."""
    from tcdb_spark.operators.graph import tree_roots

    c = load_tables(spark, sf_dir, "customer")["customer"]
    parents = c.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.floor(F.col("c_custkey") / 10) >= 1,
            F.floor(F.col("c_custkey") / 10).cast("bigint"),
        ).alias("parent"),
    )
    return tree_roots(parents).groupBy("root").agg(
        F.count("*").alias("subtree_size"), F.max("depth").alias("max_depth")
    )
