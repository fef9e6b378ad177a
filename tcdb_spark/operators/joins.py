"""Join operators.

The reference's joins are MySQL equi-joins (db/*.sql), ORM relationship
walks (tcdb/models/*.py), and two hand-rolled similarity joins
(tcdb/etl/process_storms.py:24-168, tcdb/etl/syntracks.py:281-375).
Here each is a set-based DataFrame plan; dimension sides are broadcast,
fact-fact joins are shuffle joins on their keys (AQE handles skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.functions.scalar import haversine


def star_denormalize(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column | str | list[str]]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Denormalize a fact table against a chain of (dim, join_key) pairs —
    the plan shape of the reference's flagship 5-way join
    (db/track_queries.sql:16-21: tracks⋈steps⋈storms⋈forecasts⋈models).

    Dimension sides are broadcast so the fact table never shuffles for them;
    at 100 TB this keeps the denormalization a single scan + N map-side
    hash joins.
    """
    out = fact
    for dim, key in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=key, how="inner")
    return out


def nearest_match(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_latlon: tuple[str, str],
    right_latlon: tuple[str, str],
    max_distance_nm: float | None = 100.0,
    left_key: str | list[str] | None = None,
    distance_col: str = "distance_nm",
    tiebreak: list[str] | None = None,
    method: str = "agg",
) -> DataFrame:
    """Entity-resolution nearest-neighbor join: equi-join candidates on
    ``on``, score by haversine distance, keep the single nearest right row
    per left row, optionally thresholded.

    Reference: tcdb/etl/process_storms.py:24-60 (``getClosestStorm``:
    argmin over per-candidate greatCircleDistance with 100 nm cutoff),
    used by ``investSearch``/``namedStormSearch`` (:63-168).

    The reference resolves one storm at a time with N queries; this is one
    set-based plan: equi pre-join prunes candidates (no cross join).

    Two physical argmins, identical results (ties broken by the same
    (distance, *tiebreak) order — the remaining struct fields only ever
    compare on a full tie of that prefix, which the window version left
    nondeterministic):

    - ``method='agg'`` (default): ``min(struct(distance, tiebreak...,
      payload...))`` per left key. min is a declarative aggregate, so
      Catalyst runs a map-side partial aggregation — with a low-
      selectivity equi key (the quasi-cross-join this operator exists
      for) the shuffle carries ONE row per key per partition instead of
      EVERY candidate pair. At 6B candidates / 1.5M keys that is a
      ~4000x shuffle reduction; this is the 100 TB plan.
    - ``method='window'``: row_number over (partition by key order by
      distance) — the textbook shape, kept for parity/debugging; it
      shuffles and sorts the full candidate set.
    """
    lkeys = [left_key] if isinstance(left_key, str) else (left_key or on)
    llat, llon = left_latlon
    rlat, rlon = right_latlon
    j = left.join(right, on=on, how="inner").withColumn(
        distance_col, haversine(llat, llon, rlat, rlon, "nm")
    )
    if max_distance_nm is not None:
        j = j.where(F.col(distance_col) <= max_distance_nm)
    if method == "window":
        order = [F.col(distance_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
        w = W.partitionBy(*lkeys).orderBy(*order)
        return (
            j.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
        )
    ordered = [distance_col] + [c for c in (tiebreak or []) if c != distance_col]
    rest = [c for c in j.columns if c not in lkeys and c not in ordered]
    best = j.groupBy(*lkeys).agg(F.min(F.struct(*ordered, *rest)).alias("__best"))
    out_cols = [F.col(f"__best.{c}").alias(c) for c in (*ordered, *rest)]
    # restore the join-output column order (keys, payload, distance last)
    sel = {c: F.col(c) for c in lkeys} | {c: e for c, e in zip((*ordered, *rest), out_cols)}
    return best.select(*[sel[c] for c in j.columns if c in sel])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_hours: float = 24.0,
) -> DataFrame:
    """Band join: rows match when ``abs(left_ts - right_ts) <= tolerance``
    (plus the equi keys).

    Reference: tcdb/etl/process_storms.py:104-117 — JTWC storm start dates
    drift by up to 24 h, so storm matching widens the natural-key equality
    to a +/-24 h band.

    Implementation bucketizes each side to ``tolerance``-sized time buckets
    and equi-joins on (keys, bucket +/- 1) so Catalyst plans a hash join
    instead of a broadcast-nested-loop over the raw band predicate; the
    exact band filter then prunes. At 100 TB this is the difference
    between a BNLJ cross-product and a well-partitioned shuffle join.
    """
    tol_s = int(tolerance_hours * 3600)
    lb = left.withColumn("__lb", F.floor(F.unix_timestamp(F.col(left_ts)) / tol_s))
    rb = right.withColumn("__rb", F.floor(F.unix_timestamp(F.col(right_ts)) / tol_s))
    rb = rb.withColumn("__rb", F.explode(F.array(F.col("__rb") - 1, F.col("__rb"), F.col("__rb") + 1)))
    for k in on:
        rb = rb.withColumnRenamed(k, f"__r_{k}")
    cond = (F.col("__lb") == F.col("__rb"))
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    j = lb.join(rb, on=cond, how="inner").drop("__lb", "__rb", *[f"__r_{k}" for k in on])
    # exact band filter at full (sub-second) precision
    return j.where(
        F.abs(F.col(left_ts).cast("double") - F.col(right_ts).cast("double")) <= F.lit(float(tol_s))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_hours: float | None = None,
) -> DataFrame:
    """As-of join per key group: ``backward`` takes the latest right row
    with ``right_ts <= left_ts``; ``forward`` the earliest with
    ``right_ts >= left_ts``; ``nearest`` whichever side is closer in
    time (ties resolve backward).  ``tolerance_hours`` nulls matches
    farther than the threshold — the reference's time_threshold
    matching (tcdb/etl/syntracks.py:281-325,330-360).

    Implemented as a union + window sort (no cross product): tag both
    sides, sort by (key, ts), carry last-seen-backward and
    first-seen-forward right values over the SAME sorted frame — one
    shuffle on the key regardless of direction, scale-safe.
    """
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    carried = [f"__r_{c}" for c in right_cols]
    rt = rt.select(
        *on, "__side", "__ts",
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
        F.col(right_ts).alias("__r_ts"),
    )
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    lt = lt.select(
        *left.columns, "__side", "__ts",
        *[F.lit(None).cast(rt.schema[a].dataType).alias(a) for a in carried],
        F.lit(None).cast(rt.schema["__r_ts"].dataType).alias("__r_ts"),
    )
    u = lt.unionByName(
        rt.select(*on, "__side", "__ts", *carried, "__r_ts"), allowMissingColumns=True
    )

    # one sort serves both frames: backward = last over (-inf, 0],
    # forward = first over [0, +inf) — right rows sort before left at
    # equal ts so an exact-ts right row is visible to both directions
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    w_back = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    w_fwd = W.partitionBy(*on).orderBy(*order).rowsBetween(0, W.unboundedFollowing)

    all_carried = carried + ["__r_ts"]
    for a in all_carried:
        if direction in ("backward", "nearest"):
            u = u.withColumn(f"__b_{a}", F.last(F.col(a), ignorenulls=True).over(w_back))
        if direction in ("forward", "nearest"):
            u = u.withColumn(f"__f_{a}", F.first(F.col(a), ignorenulls=True).over(w_fwd))

    out = u.where(F.col("__side") == 1)
    if direction == "backward":
        pick = {a: F.col(f"__b_{a}") for a in all_carried}
    elif direction == "forward":
        pick = {a: F.col(f"__f_{a}") for a in all_carried}
    else:  # nearest: closer of the two matched timestamps, ties backward
        d_back = F.col("__ts").cast("long") - F.col("__b___r_ts").cast("long")
        d_fwd = F.col("__f___r_ts").cast("long") - F.col("__ts").cast("long")
        use_back = F.col("__f___r_ts").isNull() | (
            F.col("__b___r_ts").isNotNull() & (d_back <= d_fwd)
        )
        pick = {
            a: F.when(use_back, F.col(f"__b_{a}")).otherwise(F.col(f"__f_{a}"))
            for a in all_carried
        }
    for a in all_carried:
        out = out.withColumn(a, pick[a])
    if tolerance_hours is not None:
        tol_s = int(tolerance_hours * 3600)
        within = (
            F.abs(F.col("__ts").cast("long") - F.col("__r_ts").cast("long")) <= tol_s
        )
        for a in all_carried:
            out = out.withColumn(a, F.when(within, F.col(a)))
    out = out.drop("__side", "__ts", "__r_ts")
    out = out.drop(*[c for c in out.columns if c.startswith("__b___") or c.startswith("__f___")])
    for c, a in zip(right_cols, carried):
        out = out.withColumnRenamed(a, c)
    return out


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    bucket_hours: float = 24.0,
    tolerance_hours: float | None = None,
) -> DataFrame:
    """Skew-resistant BACKWARD as-of join — identical results to
    ``asof_join(direction='backward')``, different partitioning.

    `asof_join` windows over the raw key, so ONE task sorts a hot
    entity's entire history — and AQE's skew handling cannot split a
    window partition the way it splits an oversized join partition.
    This variant splits each key's timeline into ``bucket_hours``
    buckets and runs the window over (key, bucket): a key with 10^8
    rows spread over 10^4 buckets becomes 10^4 independent partitions.

    Mechanics: (1) per (key, bucket) reduce the right side to its last
    row (max_by on ts — map-side combinable); (2) carry that value
    forward over the per-key BUCKET sequence (a window over one row per
    bucket, not per event — bounded by the time span, not the row
    count) to get "value as of bucket start"; (3) inject the carried
    boundary as a phantom right row sorting before everything in the
    bucket and run the usual union + last-over-window INSIDE each
    (key, bucket) partition.  Tie semantics match `asof_join`: right
    rows sort before left rows at equal ts.  Worst-case residual skew
    is a hot key whose rows share one bucket — shrink ``bucket_hours``;
    a fully degenerate single-instant key has no order to exploit in
    any as-of algorithm.  Planted-hot-key rescue measured in
    tools/scale_smoke_skew.py; equivalence pinned in
    tests/test_asof_bucketed.py.
    """
    bucket_s = int(bucket_hours * 3600)
    if bucket_s <= 0:
        # a zero-second bucket makes __ts / 0 NULL (non-ANSI), collapsing
        # every row into one NULL bucket per key — results stay correct
        # but the hot-key split this function exists for silently
        # vanishes; fail loudly instead
        raise ValueError(
            f"bucket_hours={bucket_hours} resolves to a {bucket_s}s bucket; "
            "must be >= 1 second"
        )
    carried = [f"__r_{c}" for c in right_cols]

    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
        F.col(right_ts).alias("__r_ts"),
    ).withColumn("__bkt", F.floor(F.col("__ts").cast("double") / bucket_s).cast("long"))
    lt = left.withColumn(
        "__bkt", F.floor(F.col(left_ts).cast("double") / bucket_s).cast("long")
    )

    # (1) last right row per (key, bucket): max_by over the packed row
    pack = F.struct(*carried, "__r_ts")
    bucket_last = rt.groupBy(*on, "__bkt").agg(
        F.max_by(pack, F.col("__ts")).alias("__pack")
    )

    # (2) bucket universe from BOTH sides; carry last-seen pack over
    # strictly-earlier buckets -> "as of bucket start"
    universe = (
        lt.select(*on, "__bkt")
        .distinct()
        .unionByName(bucket_last.select(*on, "__bkt"))
        .distinct()
    )
    ub = universe.join(bucket_last, [*on, "__bkt"], "left")
    w_carry = (
        W.partitionBy(*on).orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    boundary = ub.select(
        *on,
        "__bkt",
        F.last("__pack", ignorenulls=True).over(w_carry).alias("__boundary"),
    ).where(F.col("__boundary").isNotNull())

    # (3) phantom right rows at bucket start (__side = -1 sorts first),
    # union with real rows, window inside (key, bucket)
    phantom = boundary.select(
        *on,
        "__bkt",
        F.lit(-1).alias("__side"),
        F.lit(None).cast(rt.schema["__ts"].dataType).alias("__ts"),
        *[F.col("__boundary")[a].alias(a) for a in carried],
        F.col("__boundary")["__r_ts"].alias("__r_ts"),
    )
    rt2 = rt.select(*on, "__bkt", F.lit(0).alias("__side"), "__ts", *carried, "__r_ts")
    lt2 = lt.select(
        *lt.columns,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(rt.schema[a].dataType).alias(a) for a in carried],
        F.lit(None).cast(rt.schema["__r_ts"].dataType).alias("__r_ts"),
    )
    u = lt2.unionByName(rt2, allowMissingColumns=True).unionByName(
        phantom, allowMissingColumns=True
    )
    order = [F.col("__ts").asc_nulls_first(), F.col("__side").asc()]
    w_back = (
        W.partitionBy(*on, "__bkt").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    for a in [*carried, "__r_ts"]:
        u = u.withColumn(a, F.last(F.col(a), ignorenulls=True).over(w_back))
    out = u.where(F.col("__side") == 1)
    if tolerance_hours is not None:
        tol_s = int(tolerance_hours * 3600)
        within = (
            F.abs(F.col("__ts").cast("long") - F.col("__r_ts").cast("long")) <= tol_s
        )
        for a in carried:
            out = out.withColumn(a, F.when(within, F.col(a)))
    out = out.drop("__side", "__ts", "__r_ts", "__bkt")
    for c, a in zip(right_cols, carried):
        out = out.withColumnRenamed(a, c)
    return out


def exists_gate(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> tuple[DataFrame, DataFrame]:
    """Split incoming rows into (new, already_present) by natural key —
    the set-based form of the reference's per-row ``one_or_none`` gates
    (tcdb/etl/atcf_forecasts.py:75-82,101-107; tcdb/etl/process_obs.py:55-60).

    Returns (left_anti, left_semi).
    """
    ex = existing.select(*keys).dropDuplicates(keys)
    return (
        incoming.join(ex, on=keys, how="left_anti"),
        incoming.join(ex, on=keys, how="left_semi"),
    )


def interval_overlap_pairs(
    iv: DataFrame,
    key: str,
    interval_id: str,
    start: str,
    end: str,
    bin_s: int = 3600,
) -> DataFrame:
    """Interval x interval overlap self-join via coarse time-bin
    cover: each [start, end] explodes into the bins it touches,
    candidates meet through a bin EQUI-join (only time-local intervals
    ever pair), the exact overlap predicate verifies, and a distinct on
    the pair key removes bin-crossing duplicates.  Returns one row per
    overlapping pair with integer overlap seconds:
    (key_a, id_a, key_b, id_b, ov).  Pairs are canonical (key_a <
    key_b), so same-key intervals never pair.  ``bin_s`` is the skew
    lever — pick it near the median interval length; pathological hot
    bins take the df-cap treatment (operators/textdedup.py)."""
    bins = iv.select(
        F.col(key).alias("k"),
        F.col(interval_id).alias("iid"),
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bin_s), F.floor(F.col(end) / bin_s)
            )
        ).alias("bin"),
    )
    a, b = bins.alias("a"), bins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.k") < F.col("b.k"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.k").alias("key_a"),
            F.col("a.iid").alias("id_a"),
            F.col("b.k").alias("key_b"),
            F.col("b.iid").alias("id_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("ov"),
        )
        .distinct()
    )
