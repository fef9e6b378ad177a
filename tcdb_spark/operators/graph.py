"""Iterative graph operators — connected components for duplicate
clustering (§2.12 extension; generalizes the reference's pairwise
duplicate pruning, tcdb/pipeline/fs_utils.py:23-56, which only ever
compares adjacent versions and so cannot group transitive duplicates).

Spark-first design: label propagation by repeated min-join.  Each round
every node takes the minimum label among itself and its neighbors, so
labels converge to the component-minimum node id in O(graph diameter)
rounds.  Near-duplicate clusters are tiny cliques (diameter 1-2), so in
the dedup use case this terminates in 2-3 rounds regardless of corpus
size; each round is one shuffle on the edge key.  ``localCheckpoint``
truncates the growing lineage so round N's plan does not replay rounds
1..N-1, and convergence is detected with a single scalar aggregate
(labels only ever decrease, so the label sum strictly decreases until
the fixpoint).  For adversarial long-path graphs, swap the propagation
step for the large-star/small-star rewrite (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same join primitive, O(log^2 n)
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    work_dir: str | None = None,
) -> DataFrame:
    """Return (id, label) with label = min node id of the connected
    component. Only nodes that appear in ``edges`` are labelled
    (isolated nodes are by definition their own singleton cluster).

    Label propagation runs O(diameter) rounds; every 8th round the
    O(|V|) label table rides PARQUET instead of localCheckpoint to
    reset Catalyst's size estimate — checkpointed LogicalRDDs preserve
    origin stats and each round's join SQUARES them (DEVNOTES #48), so
    an un-reset high-diameter run (a 24-node chain suffices) spends
    unbounded driver time multiplying huge BigIntegers in join
    selection long before max_iter.  ``work_dir`` must be a shared
    filesystem path on a real cluster; when unset,
    `session.scratch_dir` resolves it (``tcdb.scratch.dir`` conf →
    local-mode tempdir → hard error on a real cluster)."""
    # symmetrize with ONE pass over the (possibly expensive) edge
    # derivation: explode each edge into both directions instead of
    # self-unioning the plan, which would execute the upstream join
    # twice (measured 2x input bytes in SHUFFLE_PROFILE.md)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("node"), F.col(dst).alias("nbr")),
                    F.struct(F.col(dst).alias("node"), F.col(src).alias("nbr")),
                )
            ).alias("e")
        )
        .select("e.node", "e.nbr")
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("node").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    if prev_sum is None:  # no edges at all
        sym.unpersist()
        return labels
    spark = edges.sparkSession
    tmp = None
    prev_round_path = None
    for it in range(max_iter):
        nbr_min = sym.join(labels, sym.nbr == labels.id).groupBy("node").agg(
            F.min("label").alias("nbr_label")
        )
        labels = (
            labels.join(nbr_min, labels.id == nbr_min.node, "left")
            .select(
                labels.id,
                F.least(
                    labels.label, F.coalesce(F.col("nbr_label"), labels.label)
                ).alias("label"),
            )
            .localCheckpoint()
        )
        if (it + 1) % 8 == 0:
            # stats reset (DEVNOTES #48): between resets the estimate
            # grows at most 2^8x over a real file size — harmless
            if tmp is None:
                from tcdb_spark.session import scratch_dir

                tmp = work_dir or scratch_dir(spark, "cc_rounds_")
            path = f"{tmp}/round_{it + 1}"
            labels.write.mode("overwrite").parquet(path)
            labels = spark.read.parquet(path)
            # retention contract (session.remove_scratch): the PREVIOUS
            # round's files are dead the moment this round lands; only
            # the latest dir may back the returned frame
            if prev_round_path is not None:
                from tcdb_spark.session import remove_scratch

                remove_scratch(spark, prev_round_path)
            prev_round_path = path
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected view of ``edges``.

    Returns (node, deg, val).  The graph is symmetrized first, so every
    node has out-degree >= 1 and no dangling-mass correction is needed:
    each iteration is exactly one shuffle (edges join ranks on src,
    partial-aggregated by dst) plus a broadcast-sized left join back
    onto the node list.  A fixed, small ``iters`` keeps the result
    SQL-expressible (the DuckDB oracle unrolls the same iterations as a
    CTE chain) and is the standard operating point for web-scale rank
    sweeps where full convergence is not worth the extra passes.

    At 100 TB scale: the edge list is the big side and is persisted
    once; ranks are O(|V|) and the per-iteration shuffle key is the
    edge src — identical shape to the label-propagation loop above.
    Lineage is truncated per round so iteration N does not replay
    rounds 1..N-1.
    """
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .persist()
    )
    nodes = (
        sym.groupBy("s")
        .agg(F.count("*").cast("double").alias("deg"))
        .select(F.col("s").alias("node"), "deg")
        .persist()
    )
    n = nodes.count()
    pr = nodes.withColumn("val", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            sym.join(pr, sym.s == pr.node)
            .select(F.col("d").alias("node"), (F.col("val") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("acc"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))
                ).alias("val"),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-oriented wedge enumeration.

    Returns (node, tri_cnt) for every node that participates in at
    least one triangle.  The classic distributed-triangle trick (Schank;
    Suri & Vassilvitskii's MapReduce variant): orient every undirected
    edge from its lower-(degree, id) endpoint to its higher one, then
    enumerate wedges ONLY at each edge's lower endpoint and close them
    with a semi-join.  Orientation bounds the per-node wedge fan-out by
    the out-degree, which is O(sqrt(|E|)) for any graph — so the wedge
    join never degenerates into the hub's degree^2 blow-up that a naive
    neighbor self-join suffers on power-law graphs (the 100 TB shape:
    one celebrity domain with 10^7 co-citations stays bounded).

    Three shuffles total: degree aggregation, the wedge self-join on
    the oriented source, and the closing semi-join on (v, w).  Each
    triangle is produced exactly once (at its orientation-minimal
    vertex) and re-exploded to its three members for the per-node
    counts, so the output is orientation-independent — a plain
    id-canonical SQL enumeration produces the identical result, which
    is what the DuckDB oracle does.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ew = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    # orientation key: (degree, id) — a total order, ties broken by id
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = (
        ew.select(
            F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(ku < kv, kv).otherwise(ku).alias("yk"),
        )
        .persist()
    )
    a = oriented.select("x", F.col("y").alias("w1"), F.col("yk").alias("k1"))
    b = oriented.select("x", F.col("y").alias("w2"), F.col("yk").alias("k2"))
    wedges = (
        a.join(b, "x")
        .where(F.col("k1") < F.col("k2"))
        .select("x", "w1", "w2")
    )
    closing = oriented.select(F.col("x").alias("w1"), F.col("y").alias("w2"))
    tris = wedges.join(closing, ["w1", "w2"], "left_semi")
    counts = (
        tris.select(F.explode(F.array("x", "w1", "w2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_cnt"))
    )
    return counts


def tree_roots(
    parents: DataFrame,
    node: str = "node",
    parent: str = "parent",
    max_depth: int = 1 << 20,
) -> DataFrame:
    """Resolve every node of a forest to its (root, depth) by POINTER
    DOUBLING — the O(log depth) rounds trick for transitive closure
    (recursive CTEs walk one level per round, O(depth) rounds; at a
    10-level hierarchy that is 10 sequential shuffles vs 4 here, and at
    a million-level pathological chain it is the difference between
    running and not finishing).

    Each round self-joins the current ancestor table with itself:
    (node -> anc, d) joined with (anc -> anc2, d2) becomes
    (node -> anc2, d + d2); nodes whose ancestor is already a root
    (NULL parent / self-parent / parent outside the node set) stop
    participating.  Lineage is truncated per round with
    localCheckpoint; convergence is a scalar count of unresolved rows.
    Returns (node, root, depth) with depth 0 for roots themselves."""
    p = parents.select(
        F.col(node).alias("n"),
        F.when(F.col(parent) == F.col(node), F.lit(None))
        .otherwise(F.col(parent))
        .alias("p"),
    ).persist()
    # parents that are not themselves nodes are roots living outside
    # the table; treat a hop to them as the last hop
    known = p.select(F.col("n").alias("p")).distinct()
    edges = (
        p.join(known, "p", "left_semi")
        .unionByName(
            p.join(known, "p", "left_anti").select(
                "n", F.lit(None).cast(p.schema["p"].dataType).alias("p")
            )
        )
    )
    # state: node -> (anc, d, done); done once anc has no parent
    state = edges.select(
        "n",
        F.coalesce(F.col("p"), F.col("n")).alias("anc"),
        F.when(F.col("p").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("d"),
        F.col("p").isNull().alias("done"),
    ).localCheckpoint()
    hops = 1
    converged = False
    while hops < max_depth:
        unresolved = state.where(~F.col("done")).limit(1).count()
        if unresolved == 0:
            converged = True
            break
        jump = state.where(~F.col("done")).alias("s").join(
            state.select(
                F.col("n").alias("anc"),
                F.col("anc").alias("anc2"),
                F.col("d").alias("d2"),
                F.col("done").alias("done2"),
            ).alias("t"),
            "anc",
        ).select(
            F.col("s.n").alias("n"),
            F.col("anc2").alias("anc"),
            (F.col("s.d") + F.col("d2")).alias("d"),
            F.col("done2").alias("done"),
        )
        state = state.where(F.col("done")).unionByName(jump).localCheckpoint()
        hops *= 2
    if not converged and state.where(~F.col("done")).limit(1).count():
        raise ValueError(
            "tree_roots: unresolved nodes after pointer doubling — the "
            "parent map contains a cycle (or depth exceeds max_depth); "
            "a parent relation must be a forest"
        )
    return state.select(
        "n", F.col("anc").alias("root"), F.col("d").cast("bigint").alias("depth")
    ).withColumnRenamed("n", node)


def common_neighbor_links(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    deg_cap: int = 96,
    top_n: int = 50,
) -> DataFrame:
    """Link prediction by neighborhood Jaccard: top-``top_n``
    NON-adjacent pairs ranked by |N(u) ∩ N(v)| / |N(u) ∪ N(v)|.

    ``edges`` is an undirected edge list (one row per edge, ``src`` <
    ``dst``).  Wedges go through MIDDLE vertices only: a hub of degree
    d contributes C(d, 2) candidate pairs, so middles above ``deg_cap``
    are excluded from CONNECTING (true degrees still feed the Jaccard
    denominator) — megahubs are near-zero link evidence and the
    quadratic hazard at once, the same df-cap discipline as the n-gram
    dedup inverted index.  Enumeration is per-middle sorted-neighbor
    pair generation (``collect_list`` + nested ``transform``, all
    JVM-side): each middle's adjacency is bounded by ``deg_cap`` so the
    collected list is small by construction, and each wedge is emitted
    exactly ONCE as an ordered (u < v) pair — half the candidates the
    equivalent self-join materializes before its ``ma.x < mb.x`` filter,
    and one shuffle (groupBy middle) instead of the self-join's two-
    sided exchange.  Counts stay integer; Jaccard is one final
    division; the top-n is orderBy+limit (TakeOrderedAndProject).
    Reference analogue: tcdb has no graph operators — this extends the
    entity-resolution family (SURVEY.md §2.4) to graph context.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    adj = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    # deg feeds THREE consumers (the middle-degree cap filter and the
    # final du/dv joins) whose projections differ above the aggregate,
    # so exchange reuse never fires and the adj scan + partial count
    # ran once PER consumer (stage profile, round 8: four identical
    # 64-task map stages).  deg is O(|V|) tiny rows (one per node) —
    # persist it so the aggregation runs once per lane execution.
    deg = adj.groupBy("x").agg(F.count("*").alias("d")).persist()
    capped = deg.where(F.col("d") <= deg_cap).select(F.col("x").alias("cx"))
    mid = adj.join(capped, adj["y"] == capped["cx"], "left_semi")
    # per-middle sorted neighbor list (<= deg_cap elements), then every
    # i < j pair via nested transform — slice() truncates at the array
    # end, so the length arg can safely be the full size
    nbrs = mid.groupBy("y").agg(F.sort_array(F.collect_list("x")).alias("ns"))
    # Pin the explode stage's parallelism (round 8, measured): the
    # neighbor-list exchange is tiny (~9 MiB at sf0.1), so AQE's
    # 1 MiB-min-partition coalescing shrank it to 8 partitions — but
    # the NEXT operator explodes each list into C(d, 2) pairs (60x row
    # amplification, 450k lists -> 26.7M wedges), so the lane's
    # dominant stage ran on 8 of 32 cores (118 CPU-s over 8 tasks =
    # 15 s wall; profiled in tools/stage_profile.py).  AQE sizes
    # partitions by the EXCHANGE's bytes and cannot see downstream
    # amplification, so the operator — which knows it is about to
    # explode — pins an explicit hash repartition (scale-adaptive:
    # conf-driven, not a local constant).  User-numbered repartitions
    # are exempt from AQE coalescing by design.  2x the session
    # parallelism, NOT 1x: a same-key same-count repartition is
    # collapsed into the aggregate's own ENSURE_REQUIREMENTS exchange
    # (verified in the plan) and the coalesce re-fires; the distinct
    # count survives, and the finer granularity also evens out the
    # C(d, 2) per-middle work spread.  The extra exchange moves only
    # the ~9 MiB neighbor lists — measured: the wedge stage went
    # 8 -> 64 tasks and the lane's dominant stage wall 15 s -> ~1 s.
    n_part = 2 * int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    nbrs = nbrs.repartition(n_part, "y")

    # Pair-key packing (round 7, measured 8.6 s -> 6.7 s at sf0.1 —
    # interleaved best-of-3, identical output): the pair-count exchange
    # moves ~27M rows and is the lane's dominant cost, so the (u, v)
    # pair rides ONE bigint (u << 32 | v) through the shuffle, the
    # broadcast anti-join against the edge set, and the partial
    # aggregation, unpacking only for the two degree joins at the
    # 22.7M->top_n tail.  Guarded: only when both ids are integral and
    # a one-job min/max probe over the (persisted) edge set proves they
    # fit [0, 2^31) — anything else takes the struct path unchanged.
    int_types = ("tinyint", "smallint", "int", "bigint")
    packable = all(t in int_types for _, t in e.dtypes)
    if packable:
        mm = e.agg(
            F.min(F.least("u", "v")).alias("lo"), F.max(F.greatest("u", "v")).alias("hi")
        ).first()
        packable = (
            mm["lo"] is not None and mm["lo"] >= 0 and mm["hi"] < (1 << 31)
        )
    if packable:
        pairs = nbrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (a, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "b -> cast(a as bigint) * 4294967296 + b)))"
                )
            ).alias("pk")
        )
        cn = pairs.groupBy("pk").agg(F.count("*").alias("cn"))
        epk = e.select(
            (F.col("u").cast("bigint") * F.lit(4294967296) + F.col("v")).alias("pk")
        )
        ne = cn.join(F.broadcast(epk), "pk", "left_anti").select(
            F.shiftright("pk", 32).cast(e.schema["u"].dataType).alias("u"),
            (F.col("pk") % F.lit(4294967296)).cast(e.schema["v"].dataType).alias("v"),
            "cn",
        )
    else:
        pairs = nbrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (a, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "b -> named_struct('u', a, 'v', b))))"
                )
            ).alias("p")
        ).select("p.u", "p.v")
        cn = pairs.groupBy("u", "v").agg(F.count("*").alias("cn"))
        ne = cn.join(e, ["u", "v"], "left_anti")
    j = ne.join(
        F.broadcast(deg.select(F.col("x").alias("u"), F.col("d").alias("du"))), "u"
    ).join(F.broadcast(deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))), "v")
    jac = F.col("cn").cast("double") / (F.col("du") + F.col("dv") - F.col("cn")).cast("double")
    return (
        j.select(
            "u",
            "v",
            F.col("cn").cast("bigint").alias("common_neighbors"),
            jac.alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(top_n)
    )


def wedge_candidate_count(
    edges: DataFrame, src: str = "u", dst: str = "v", deg_cap: int = 96
) -> int:
    """Diagnostic: the number of wedge candidate pairs
    ``common_neighbor_links`` enumerates for this edge set — the sum of
    C(d, 2) over middles with degree <= ``deg_cap``.  Benchmarks record
    it so a runtime regression on the graph lane can be attributed to a
    plan change vs a denser fixture (the candidate count is a property
    of the DATA, the wall time of the PLAN)."""
    adj = (
        edges.select(F.col(src).alias("x"))
        .unionAll(edges.select(F.col(dst).alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
        .where(F.col("d") <= deg_cap)
        .agg(F.coalesce(F.sum(F.expr("d * (d - 1) / 2")), F.lit(0)).alias("w"))
    )
    return int(adj.first()["w"])
