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


def _asof_pack(rt: DataFrame, carried: list[str]):
    """The transport struct for as-of matching: leading (right ts,
    xxhash64-of-values) fields make struct MAX = "latest right row,
    equal-ts ties broken deterministically by content" and struct MIN
    the forward mirror (ADVICE r6: plain window last()/max_by tie-broke
    arbitrarily).  Requires orderable right_cols types (no maps) — the
    carried fields participate in the comparison only on (ts, hash)
    collisions."""
    return F.struct(
        F.col("__ts").alias("__pts"),
        F.xxhash64(*[F.col(a) for a in carried]).alias("__ptie"),
        *[F.col(a).alias(a) for a in carried],
    )


def _asof_pack_src(right_ts: str, right_cols: list[str], carried: list[str]):
    """:func:`_asof_pack` built directly over the SOURCE column names —
    same struct fields, same values (aliases don't change inputs), but
    it composes into the right side's single projection instead of
    requiring a pre-renamed intermediate (round 9 plan-construction
    trim: every extra DataFrame op is a py4j round-trip + an analysis
    pass; see asof_join_bucketed's note)."""
    return F.struct(
        F.col(right_ts).alias("__pts"),
        F.xxhash64(*[F.col(c) for c in right_cols]).alias("__ptie"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )


def _asof_pick(direction: str):
    """Shared chooser: __b (latest at-or-before) / __f (earliest
    at-or-after) -> the direction's struct, ties resolving backward for
    ``nearest`` (distance in whole seconds, matching DuckDB epoch())."""
    if direction == "backward":
        return F.col("__b")
    if direction == "forward":
        return F.col("__f")
    bts = F.col("__b").getField("__pts")
    fts = F.col("__f").getField("__pts")
    d_back = F.col("__ts").cast("long") - bts.cast("long")
    d_fwd = fts.cast("long") - F.col("__ts").cast("long")
    use_back = fts.isNull() | (bts.isNotNull() & (d_back <= d_fwd))
    return F.when(use_back, F.col("__b")).otherwise(F.col("__f"))


def _asof_finish(out, left_cols, right_cols, carried, chosen, tolerance_hours):
    # one projection, the chooser inlined per carried column — exactly
    # what CollapseProject produced from the former
    # withColumn-then-extract chain, minus two analysis passes (round 9
    # plan-construction trim); values are identical (deterministic
    # expressions)
    if tolerance_hours is not None:
        tol_s = int(tolerance_hours * 3600)
        cts = chosen.getField("__pts")
        within = F.abs(F.col("__ts").cast("long") - cts.cast("long")) <= tol_s
        chosen = F.when(within, chosen)
    return out.select(
        *left_cols,
        *[chosen.getField(a).alias(c) for c, a in zip(right_cols, carried)],
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

    Implemented as a union + window (no cross product): tag both sides,
    sort by (key, ts), and take a running struct-MAX over a RANGE frame
    ``(-inf, current]`` (backward) / struct-MIN over the descending
    mirror (forward).  RANGE frames include ALL peers at the boundary
    timestamp, so an exact-ts right row is visible to both directions
    regardless of within-ts row order — the row-frame formulation this
    replaces silently missed exact-ts matches in the forward direction.
    Equal-ts right-row ties resolve DETERMINISTICALLY via a content
    hash inside the struct.  Both frames are "growing" in their sort
    order (O(n) running aggregates, never a shrinking frame recompute);
    one shuffle on the key regardless of direction, scale-safe; the
    packed struct makes it ONE window expression however many columns
    are carried.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    carried = [f"__r_{c}" for c in right_cols]
    # single projection per side (round 9 plan-construction trim: the
    # former rename-then-pack-then-withColumn chain cost one py4j round
    # trip + analysis pass per step; CollapseProject merged them anyway,
    # so the optimized plan is unchanged — output bit-equality pinned in
    # tests/test_asof_bucketed.py, oracle re-attested)
    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        _asof_pack_src(right_ts, right_cols, carried).alias("__pack"),
        F.lit(0).alias("__side"),
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(rt.schema["__pack"].dataType).alias("__pack"),
        F.lit(1).alias("__side"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    w_asc = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc())
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    w_desc = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").desc())
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    if direction in ("backward", "nearest"):
        u = u.withColumn("__b", F.max("__pack").over(w_asc))
    if direction in ("forward", "nearest"):
        u = u.withColumn("__f", F.min("__pack").over(w_desc))

    out = u.where(F.col("__side") == 1)
    return _asof_finish(
        out, left.columns, right_cols, carried, _asof_pick(direction), tolerance_hours
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    bucket_hours: float = 24.0,
    tolerance_hours: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Skew-resistant as-of join — identical results to
    ``asof_join(direction=...)`` in all three directions (VERDICT r6
    #4 added forward/nearest), different partitioning.

    `asof_join` windows over the raw key, so ONE task sorts a hot
    entity's entire history — and AQE's skew handling cannot split a
    window partition the way it splits an oversized join partition.
    This variant splits each key's timeline into ``bucket_hours``
    buckets and runs the window over (key, bucket): a key with 10^8
    rows spread over 10^4 buckets becomes 10^4 independent partitions.

    Mechanics, per direction (forward is the exact mirror of backward):
    (1) per (key, bucket) reduce to the struct-MAX (latest right row;
    deterministic ties — see ``_asof_pack``) and/or struct-MIN
    (earliest) in ONE map-side-combinable aggregation over both sides'
    bucket rows — left rows ride along as null-pack markers (max/min
    skip nulls), which folds the bucket-universe construction into the
    same exchange; (2) carry that reduction over the
    per-key BUCKET sequence (a window over one row per bucket, not per
    event — bounded by the time span, not the row count): last-seen
    pack over strictly-earlier buckets = "value as of bucket start",
    and over the DESCENDING bucket order = "earliest value after bucket
    end"; (3) inject the carried boundaries as phantom rows (null ts,
    sorting first in BOTH in-bucket range frames via nulls-first) and
    run the same growing-range-frame struct MAX/MIN as ``asof_join``
    INSIDE each (key, bucket) partition.  Backward and forward
    boundaries ride SEPARATE pack columns so each direction's phantom
    is invisible to the other.  ``nearest`` picks the closer side, ties
    backward, exactly like the plain operator.

    Worst-case residual skew is a hot key whose rows share one bucket —
    shrink ``bucket_hours``; a fully degenerate single-instant key has
    no order to exploit in any as-of algorithm.  Planted-hot-key rescue
    measured in tools/scale_smoke_skew.py; three-direction equivalence
    pinned in tests/test_asof_bucketed.py.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
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
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    carried = [f"__r_{c}" for c in right_cols]

    # single projection per side (round 9 plan-construction trim — see
    # asof_join; optimized plan unchanged, outputs pinned bit-equal)
    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        _asof_pack_src(right_ts, right_cols, carried).alias("__pack"),
        F.floor(F.col(right_ts).cast("double") / bucket_s)
        .cast("long")
        .alias("__bkt"),
    )
    pack_t = rt.schema["__pack"].dataType
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.floor(F.col(left_ts).cast("double") / bucket_s).cast("long").alias("__bkt"),
    )

    # (1)+(2a) per-(key, bucket) reductions over the bucket universe of
    # BOTH sides in ONE aggregation: left rows enter as null-pack bucket
    # markers and max/min skip nulls, so a bucket holding only left rows
    # reduces to null packs — exactly the row the former
    # distinct-union-distinct universe + LEFT JOIN onto the right-only
    # reduction produced, minus two exchanges and the join (r8 §12).
    # Map-side combinable like any hash aggregate.
    null_pack = F.lit(None).cast(pack_t)
    marked = rt.select(*on, "__bkt", "__pack").unionByName(
        lt.select(*on, "__bkt", null_pack.alias("__pack"))
    )
    aggs = []
    if need_b:
        aggs.append(F.max("__pack").alias("__last_pack"))
    if need_f:
        aggs.append(F.min("__pack").alias("__first_pack"))
    # (2b) carry reductions across the per-key bucket sequence
    # (ascending for backward, descending for forward — buckets
    # partition time, so the nearest non-empty future bucket's earliest
    # row IS the global earliest-after)
    ub = marked.groupBy(*on, "__bkt").agg(*aggs)
    sels = [*on, F.col("__bkt")]
    keep = []
    if need_b:
        w_carry_b = (
            W.partitionBy(*on).orderBy(F.col("__bkt").asc()).rowsBetween(W.unboundedPreceding, -1)
        )
        sels.append(
            F.last("__last_pack", ignorenulls=True).over(w_carry_b).alias("__bnd_b")
        )
        keep.append(F.col("__bnd_b").isNotNull())
    if need_f:
        w_carry_f = (
            W.partitionBy(*on).orderBy(F.col("__bkt").desc()).rowsBetween(W.unboundedPreceding, -1)
        )
        sels.append(
            F.last("__first_pack", ignorenulls=True).over(w_carry_f).alias("__bnd_f")
        )
        keep.append(F.col("__bnd_f").isNotNull())
    cond = keep[0]
    for k in keep[1:]:
        cond = cond | k
    boundary = ub.select(*sels).where(cond)

    # (3) phantom boundary rows (null ts -> first in both nulls-first
    # range frames) + real rows, growing frames INSIDE (key, bucket).
    # Each direction has its own pack column so the other direction's
    # phantom can never leak into its frame.
    phantom = boundary.select(
        *on,
        "__bkt",
        F.lit(-1).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__ts"),
        (F.col("__bnd_b") if need_b else null_pack).alias("__pack_b"),
        (F.col("__bnd_f") if need_f else null_pack).alias("__pack_f"),
    )
    rt2 = rt.select(
        *on,
        "__bkt",
        F.lit(0).alias("__side"),
        "__ts",
        F.col("__pack").alias("__pack_b"),
        F.col("__pack").alias("__pack_f"),
    )
    lt2 = lt.select(
        "*",
        F.lit(1).alias("__side"),
        null_pack.alias("__pack_b"),
        null_pack.alias("__pack_f"),
    )
    u = lt2.unionByName(rt2, allowMissingColumns=True).unionByName(
        phantom, allowMissingColumns=True
    )
    if need_b:
        w_asc = (
            W.partitionBy(*on, "__bkt")
            .orderBy(F.col("__ts").asc_nulls_first())
            .rangeBetween(W.unboundedPreceding, W.currentRow)
        )
        u = u.withColumn("__b", F.max("__pack_b").over(w_asc))
    if need_f:
        w_desc = (
            W.partitionBy(*on, "__bkt")
            .orderBy(F.col("__ts").desc_nulls_first())
            .rangeBetween(W.unboundedPreceding, W.currentRow)
        )
        u = u.withColumn("__f", F.min("__pack_f").over(w_desc))
    out = u.where(F.col("__side") == 1)
    return _asof_finish(
        out, left.columns, right_cols, carried, _asof_pick(direction), tolerance_hours
    )


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
