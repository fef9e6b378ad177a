"""Hot-key hygiene for inverted-index text operators.

An inverted shingle index self-joined on the shingle key is the standard
near-dup / decontamination shape, but a "hot" shingle (boilerplate text
with document frequency in the millions at crawl scale) makes the
equi-join quadratic on that one key: df^2 candidate pairs land in a
single shuffle partition.  The standard fix — used by every production
dedup pipeline — is a document-frequency cap: drop shingles with
``df > cap`` from the index *before* the join.  Hot shingles carry no
signal anyway (every doc "matches" on them), so the cap improves both
cost and precision.

AQE's skew-join split spreads a hot partition over tasks but cannot
reduce the O(df^2) pair count itself; only the cap bounds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MinHash-LSH geometry shared by the batch catalog queries
# (plans/queries_dedup_near.py, which mirrors these in its DuckDB
# oracles) and the incremental index path below.
N_HASHES = 8
N_BANDS = 4  # 2 minhash rows per band
SHINGLE = 5


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles(toks: Column | str) -> Column:
    """Word 5-shingles: rare enough that the inverted index never
    explodes on the hot-key problem frequent shingles cause at scale.
    Total (empty array below SHINGLE tokens) — the when() guard keeps
    element_at behind a genuine short-circuit even when the optimizer
    hoists the expression past an upstream size filter (see
    plans/queries_corpus._ngrams for the failure shape).

    Pass a COLUMN NAME (str) to build the expression as one
    server-parsed SQL string (DEVNOTES #43 — the Column-object form
    costs ~25 py4j round-trips per call and this helper sits in every
    near-dedup lane's build path); the Column overload stays for
    composed expressions.  String concatenation output is
    value-identical either way."""
    if isinstance(toks, str):
        t = f"`{toks}`"
        parts = ", ".join(f"element_at({t}, i + {k})" for k in range(SHINGLE))
        sh = (
            f"transform(sequence(1, size({t}) - {SHINGLE - 1}), "
            f"i -> concat_ws(' ', {parts}))"
        )
        return F.expr(
            f"CASE WHEN size({t}) >= {SHINGLE} THEN {sh} "
            f"ELSE CAST(array() AS array<string>) END"
        )
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (SHINGLE - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(SHINGLE)]),
    )
    return F.when(F.size(toks) >= SHINGLE, sh).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hashes(sh: Column | str) -> Column:
    """64 hex chars per shingle: md5(s) || md5('x'||s). The 8 minhash
    functions are the eight 8-char windows — two md5 calls per shingle
    instead of eight (md5 dominates the runtime here).  Str form builds
    server-side (DEVNOTES #43), value-identical."""
    if isinstance(sh, str):
        return F.expr(
            f"transform(`{sh}`, s -> concat(md5(CAST(s AS BINARY)), "
            f"md5(CAST(concat('x', s) AS BINARY))))"
        )
    return F.transform(
        sh,
        lambda s: F.concat(
            F.md5(s.cast("binary")),
            F.md5(F.concat(F.lit("x"), s).cast("binary")),
        ),
    )


def minhash(hashes: Column | str, j: int) -> Column:
    """j-th minhash: lexicographic min of the j-th 8-hex-digit window —
    fixed-width lowercase hex compares identically to the numeric value,
    so no cross-engine hex->int conversion is needed.  Str form builds
    server-side (DEVNOTES #43), value-identical."""
    if isinstance(hashes, str):
        return F.expr(
            f"array_min(transform(`{hashes}`, h -> substring(h, {1 + 8 * j}, 8)))"
        )
    return F.array_min(F.transform(hashes, lambda h: F.substring(h, 1 + 8 * j, 8)))


def lsh_band_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, band, band_key) LSH index rows for a document frame —
    the persistable signature state of near-dedup. Computing this for a
    NEW batch and joining against the stored index is the incremental
    form: day N's crawl never re-hashes days 1..N-1 (see
    ``incremental_lsh_candidates``). One pass: shingle -> two md5s ->
    8 minhash windows -> 4 band keys exploded."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    ).where(F.size("toks") >= SHINGLE)
    hs = toks.select("doc_id", shingles("toks").alias("sh")).select(
        "doc_id", shingle_hashes("sh").alias("hashes")
    )
    sigs = hs.select(
        "doc_id", *[minhash("hashes", j).alias(f"mh{j}") for j in range(N_HASHES)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def incremental_lsh_candidates(index: DataFrame, new_bands: DataFrame) -> DataFrame:
    """Candidate near-dup pairs introduced by a NEW batch against an
    existing LSH index (plus within the batch itself): join the batch's
    band rows against ``index UNION new`` on (band, band_key), keep
    pairs where the new doc is one side. Cost is O(batch × collisions),
    never O(corpus²) — the property that makes daily dedup of a 100 TB
    corpus feasible. Append ``new_bands`` to the stored index afterwards
    to maintain it (plain parquet append; rows are immutable).

    Returns (doc_a, doc_b) with doc_a < doc_b, doc_b always from the
    new batch when the pair crosses batches."""
    existing = index.alias("a")
    fresh = new_bands.alias("b")
    cross = existing.join(
        fresh,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
        F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
    )
    within = (
        new_bands.alias("x")
        .join(
            new_bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    return cross.unionByName(within).distinct()


def hot_keys(inv: DataFrame, key: str | list[str], df_cap: int) -> DataFrame:
    """Distinct values of ``key`` (a column or a composite key list)
    whose row frequency exceeds ``df_cap``.

    ``inv`` must already be per-document distinct in ``key`` (one row per
    (doc, key)) so the row count *is* the document frequency.  The result
    is tiny by construction (only keys hotter than the cap), so callers
    broadcast it.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return (
        inv.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > df_cap)
        .select(*keys)
    )


def drop_hot_keys(inv: DataFrame, key: str | list[str], df_cap: int) -> DataFrame:
    """Remove rows whose ``key`` (column or composite key list) has
    document frequency > ``df_cap``.

    One extra aggregation over the index (map-side partial, key-wise
    shuffle) buys a bounded join: afterwards no key can contribute more
    than ``df_cap``^2 pairs.  The hot set is broadcast, so the filter
    itself adds no shuffle to the main path.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return inv.join(F.broadcast(hot_keys(inv, keys, df_cap)), keys, "left_anti")


def incremental_winnow_candidates(index: DataFrame, new_fps: DataFrame) -> DataFrame:
    """Substring-copy candidate pairs introduced by a NEW batch against
    a stored winnowing-fingerprint index (plans/queries_text
    .winnow_frame rows: doc_id, pos, fp) — the winnow twin of
    ``incremental_lsh_candidates``: day N's crawl never re-fingerprints
    days 1..N-1, and the equi-join on ``fp`` costs O(batch x
    collisions).  Pairs are scored by the number of DISTINCT shared
    fingerprints (>= 2 is the ``winnow_contamination`` flag threshold;
    callers filter).  Append ``new_fps`` to the index afterwards (plain
    parquet append; rows are immutable).

    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b."""
    both = index.select("doc_id", "fp").unionByName(new_fps.select("doc_id", "fp"))
    fresh = new_fps.select(F.col("doc_id").alias("new_doc"), "fp").distinct()
    pairs = (
        both.distinct()
        .alias("a")
        .join(fresh.alias("b"), "fp")
        .where(F.col("a.doc_id") != F.col("b.new_doc"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.new_doc")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.new_doc")).alias("doc_b"),
            "fp",
        )
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("fp").alias("n_shared")
    )


def prefix_jaccard_pairs(sh: DataFrame, t: float) -> DataFrame:
    """Exact threshold-Jaccard self-join with PPJoin prefix filtering
    (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08 — public algorithms;
    no reference analog, the reference corpus fits one box).

    ``sh`` is (doc_id, shingles array<string>, already distinct).  Each
    doc's shingles are ordered by ascending global document frequency
    (shingle text tiebreak) and only the first ``n - ceil(t*n) + 1``
    enter the index: two sets with Jaccard >= t must share a prefix
    element under any common global order, so the candidate set is
    complete.  Candidates verify exactly against the full arrays.

    Plan shape (the 100 TB argument): df via a shingle-partitioned
    window, per-doc rank via a doc-partitioned window — no global
    sorts; the prefix equi-join is the only pair-shaped shuffle, and
    because the prefix keeps the RAREST shingles, hot-key pair blowup
    never materializes.  Returns (doc_a, doc_b, jaccard) rounded 4."""
    from pyspark.sql.window import Window as W

    sh = sh.persist()  # feeds the index AND the verification join
    ex = sh.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    dfw = W.partitionBy("shingle")
    rnw = W.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = (
        ex.withColumn("df", F.count(F.lit(1)).over(dfw))
        .withColumn("rn", F.row_number().over(rnw))
        .where(F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1)
        .select("doc_id", "shingle")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
    )
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return verified.where(jac >= t).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def containment_pairs(sh: DataFrame, t: float, eval_pred, train_pred) -> DataFrame:
    """Asymmetric containment join: |eval ∩ train| / |eval| >= t, the
    benchmark-decontamination metric symmetric Jaccard under-fires on.
    Only the PROBE (eval) side prefix-prunes — an eval doc with
    containment >= t must expose one of its ``n - ceil(t*n) + 1``
    rarest shingles — while the train side stays fully inverted (the
    index is reusable across benchmark sweeps).  ``eval_pred`` /
    ``train_pred`` are Column predicates over doc_id selecting the two
    sides.  Returns (eval_doc, train_doc, containment) rounded 4."""
    from pyspark.sql.window import Window as W

    sh = sh.persist()
    ex = sh.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    dfw = W.partitionBy("shingle")
    rnw = W.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = ex.withColumn("df", F.count(F.lit(1)).over(dfw)).withColumn(
        "rn", F.row_number().over(rnw)
    )
    eval_prefix = ranked.where(
        eval_pred(F.col("doc_id"))
        & (F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1)
    ).select(F.col("doc_id").alias("eval_doc"), "shingle")
    train_index = ranked.where(train_pred(F.col("doc_id"))).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    cand = eval_prefix.join(train_index, "shingle").select(
        "eval_doc", "train_doc"
    ).distinct()
    se = sh.select(F.col("doc_id").alias("eval_doc"), F.col("shingles").alias("sh_e"))
    st = sh.select(F.col("doc_id").alias("train_doc"), F.col("shingles").alias("sh_t"))
    verified = (
        cand.join(se, "eval_doc")
        .join(st, "train_doc")
        .select(
            "eval_doc",
            "train_doc",
            F.size(F.array_intersect("sh_e", "sh_t")).cast("long").alias("n_inter"),
            F.size("sh_e").alias("n_eval"),
        )
    )
    cont = F.col("n_inter").cast("double") / F.col("n_eval")
    return verified.where(cont >= t).select(
        "eval_doc", "train_doc", F.round(cont, 4).alias("containment")
    )
