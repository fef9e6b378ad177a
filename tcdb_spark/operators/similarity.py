"""Similarity-search operators: IVF (inverted-file) approximate
nearest-neighbor — the trained-quantizer counterpart of the LSH-bucketed
path (plans/queries_sim.lsh_bucket_ann), per SURVEY.md §2.12 sim-topk.

Index = spherical k-means coarse quantizer (driver-trained on a bounded
deterministic sample, fixed seed) assigning every vector to a centroid
bucket via one Arrow matmul per batch; search probes the ``nprobe``
nearest buckets per query and runs exact cosine top-k inside — as
block matmuls (``ivf_search_blocked``, the production path) or as
column-expression folds (``ivf_search``, the pinned-float-order path
the exact-attestation oracles hash). At 100 TB the index table is
partitioned by bucket so a probe touches only nprobe/k_centroids of
the data; recall tunes with nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)




def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _l2_normalize(arr):
    n = F.sqrt(F.aggregate(F.transform(arr, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return F.transform(arr, lambda x: x / n)


def _lloyd_kmeans(X, k: int, seed: int, iters: int = 25, n_init: int | None = None):
    """Driver-side spherical k-means on a bounded sample: ``n_init``
    k-means++ seeded Lloyd runs (seeds derived deterministically from
    ``seed``), keep the lowest-inertia quantizer.  Deterministic for a
    fixed (X order, seed, BLAS build); distances use the matmul
    identity ||x-c||^2 = ||x||^2 + ||c||^2 - 2 x·c so the working set
    is n×k floats, never n×k×d; assignment runs in float32 (2× the
    memory bandwidth, and quantizer cell boundaries don't need double
    precision), iterations stop at label convergence, and the restart
    count adapts to the problem size — multiple restarts matter for
    tiny samples where a bad k-means++ draw can cost recall, while a
    50k-point sample almost surely seeds well once."""
    n = X.shape[0]
    k = min(k, n)
    if n_init is None:
        n_init = 4 if n * k <= 2_000_000 else 1
    Xf = np.ascontiguousarray(X, dtype="float32")
    x2 = (Xf * Xf).sum(1)

    def one_run(s):
        rng = np.random.RandomState(s)
        centers = np.empty((k, Xf.shape[1]), dtype="float32")
        centers[0] = Xf[rng.randint(n)]
        d2 = ((Xf - centers[0]) ** 2).sum(1, dtype="float64")
        for j in range(1, k):  # k-means++ seeding
            tot = d2.sum()
            probs = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
            centers[j] = Xf[rng.choice(n, p=probs)]
            d2 = np.minimum(d2, ((Xf - centers[j]) ** 2).sum(1, dtype="float64"))
        prev = None
        for _ in range(iters):
            c2 = (centers * centers).sum(1)
            lab = (c2[None, :] - 2.0 * (Xf @ centers.T)).argmin(1)
            if prev is not None and (lab == prev).all():
                break  # converged: the next update is a no-op
            prev = lab
            # vectorized per-cluster means: d bincount passes (C-speed)
            # instead of k boolean masks (the Python loop dominated the
            # build at 50k x 256)
            cnt = np.bincount(lab, minlength=k).astype("float32")
            sums = np.empty_like(centers)
            for j in range(Xf.shape[1]):
                sums[:, j] = np.bincount(lab, weights=Xf[:, j], minlength=k)
            nz = cnt > 0  # empty cluster keeps its old center
            centers[nz] = sums[nz] / cnt[nz, None]
        c2 = (centers * centers).sum(1)
        inertia = (x2[:, None] + c2[None, :] - 2.0 * (Xf @ centers.T)).min(1).sum()
        return inertia, centers

    best = min((one_run(seed + 1000 * r) for r in range(n_init)), key=lambda t: t[0])
    return best[1].astype("float64")


def ivf_build(
    emb: DataFrame,
    k_centroids: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
    _sample_pdf=None,
    extra_cols: list[str] | None = None,
):
    """Train the coarse quantizer and bucket every vector.

    Vectors are L2-normalized before k-means (spherical quantization):
    the search ranks by cosine, and on the unit sphere euclidean order
    IS cosine order (||a-b||^2 = 2 - 2cos), so buckets line up with the
    metric being searched. Raw embeddings are kept for exact re-ranking.

    The quantizer trains DRIVER-SIDE on a deterministic bounded sample
    (id-hash modulus, never more than ``train_cap`` vectors sorted by
    vec_id — partitioning cannot change the result), then every vector
    is assigned distributedly.  That is the production IVF lifecycle at
    100 TB — train on a sample once, assign each batch with the frozen
    centroids (``ivf_assign``) — and it replaces the pyspark.ml KMeans
    fit whose ~20 distributed iterations cost seconds of job scheduling
    to cluster what is at most a few-MB sample.

    Returns (indexed_df with ``bucket`` column, centroids list[list[float]]).
    """
    import numpy as np

    # extra_cols ride the assignment projection into the index (see
    # _assign_bucket passthrough); the training sample stays the bare
    # (vec_id, emb) projection so its derivation — and therefore the
    # trained centroids — is byte-identical with or without extras.
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    # _sample_pdf: a caller that trains a SECOND quantizer level from
    # the same deterministic sample (ivfpq_build) passes the collected
    # frame in so the corpus-scan sampling job runs once, not once per
    # level — identical result by construction (same derivation, same
    # cap, deterministic sample).
    pdf = _sample_pdf if _sample_pdf is not None else _bounded_train_sample(base, train_cap)
    X = np.stack(pdf["emb"].to_numpy())
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(nrm == 0, 1.0, nrm)
    centers = _lloyd_kmeans(X, k_centroids, seed)
    centroids = [c.tolist() for c in centers]
    # ||emb|| stored in the index: cosine at search time is then one
    # dot per candidate, not three folds
    if extra_cols:
        base = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
            *extra_cols,
        )
    return _assign_bucket(base, centroids), centroids


def ivf_search(
    indexed: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    candidate_filter=None,
) -> DataFrame:
    """Probe the nprobe nearest centroid buckets per query, exact cosine
    top-k inside. ``queries``: (q_id, q_emb array<double>).
    ``candidate_filter``: optional Column over the joined (query x
    candidate) frame applied BEFORE top-k — e.g. a label-mismatch
    predicate turns the search into hard-negative mining (k nearest
    among a constrained candidate class)."""
    cents = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    # per query: distances to every centroid -> nprobe smallest bucket ids.
    # queries are normalized to match the spherical quantizer (ivf_build)
    with_d = queries.withColumn("q_nrm", _norm(F.col("q_emb"))).withColumn(
        "__qn", _l2_normalize(F.col("q_emb"))
    ).withColumn(
        "__dists",
        F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(c, F.col("__qn"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
        ),
    )
    n_cent = len(centroids)
    probe = with_d.withColumn(
        "bucket",
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_cent - 1)),
                        lambda i: F.struct(
                            F.element_at(F.col("__dists"), i + 1).alias("d"),
                            i.alias("bucket"),
                        ),
                    )
                ),
                1,
                nprobe,
            )
        ),
    ).select(
        *queries.columns, "q_nrm", F.col("bucket.bucket").alias("bucket")
    )  # carry ALL query-side columns (e.g. q_label for candidate_filter)

    cand = indexed.join(probe, on="bucket").where(F.col("vec_id") != F.col("q_id"))
    if candidate_filter is not None:
        cand = cand.where(candidate_filter)
    scored = cand.select(
        "q_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def ivf_search_blocked(
    indexed: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    mismatch_cols: tuple[str, str] | None = None,
    fold_order: bool = False,
) -> DataFrame:
    """Block-matrix IVF search: scoring runs as ONE numpy matmul per
    (probing queries x bucket candidates) block inside a cogrouped
    applyInPandas, and only the k survivors per (query, bucket) leave
    Python — the embeddings never ride the pair join.  Versus the
    row-expression path (``ivf_search``), the shuffled volume drops
    from |pairs| x dim doubles to |queries| x nprobe x k scalar rows,
    and the dot products move from interpreted per-element HOF folds to
    BLAS.  Each candidate lives in exactly one bucket, so cross-probe
    results are disjoint and the global per-query top-k window runs
    over at most nprobe*k rows per query.

    ``mismatch_cols=(q_col, cand_col)`` masks pairs whose two columns
    are EQUAL before top-k (label-mismatch hard-negative mining).
    Self-pairs (vec_id == q_id) are always masked.  Ranks and
    tie-breaks ((-cos, vec_id)) match ``ivf_search``.

    ``fold_order=True`` (round 9) reproduces ``ivf_search``'s float
    semantics BIT-FOR-BIT while keeping the block shape: the pair-dot
    matrix accumulates one dimension at a time
    (``D += outer(Q[:, i], B[:, i])`` — per pair that is
    ``((0.0 + p_0) + p_1) + ...``, exactly the ``aggregate(zip_with)``
    left fold), the query norm is the same sequential
    ``sqrt(0.0 + x_0^2 + ...)``, the candidate norm is the index's
    ``nrm`` column unchanged, and the division is ``D / (qn * cn)``
    with no zero-guards — so every cosine equals the fold path's
    double.  Mismatch masking additionally drops NULL-label pairs on
    EITHER side, matching the SQL ``label <> q_label`` filter's
    three-valued semantics the row path applied.  This replaces the
    interpreted HOF fold the exact-attestation lanes paid per pair
    (~3.8 us/pair interpreted lambda frames — 15 s of the 23 s
    hard_negative_mining wall at sf0.1) with vectorized numpy at the
    same float values; BLAS (`Q @ B.T`) stays the default for the
    recall-gated production configs.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")
    c2 = (C * C).sum(1)
    npr = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def probes(e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        Xn = X / np.where(nrm == 0, 1.0, nrm)[:, None]
        D = c2[None, :] - 2.0 * (Xn @ C.T)
        idx = np.argsort(D, axis=1, kind="stable")[:, :npr]  # ties -> low id
        return pd.Series(list(idx.astype("int32")))

    q_mis = [mismatch_cols[0]] if mismatch_cols else []
    c_mis = [mismatch_cols[1]] if mismatch_cols else []
    probe = queries.select(
        "q_id", "q_emb", *q_mis, F.explode(probes(F.col("q_emb"))).alias("bucket")
    )
    cand = indexed.select("vec_id", "emb", "nrm", "bucket", *c_mis)

    qt = dict(queries.dtypes)["q_id"]
    ct = dict(indexed.dtypes)["vec_id"]
    out_schema = f"q_id {qt}, vec_id {ct}, cos double"
    empty = pd.DataFrame({"q_id": [], "vec_id": [], "cos": []})

    def score(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if qdf.empty or cdf.empty:
            return empty
        Q = np.stack(qdf["q_emb"].to_numpy())
        B = np.stack(cdf["emb"].to_numpy())
        cn = cdf["nrm"].to_numpy()
        if fold_order:
            # sequential-over-dims accumulation, vectorized over pairs:
            # bit-identical to the aggregate(zip_with) left fold (and
            # to _norm for qn); no zero-guards, like ivf_search
            d = Q.shape[1]
            D = np.zeros((Q.shape[0], B.shape[0]))
            S = np.zeros(Q.shape[0])
            for i in range(d):
                D += np.multiply.outer(Q[:, i], B[:, i])
                S += Q[:, i] * Q[:, i]
            qn = np.sqrt(S)
            M = D / np.outer(qn, cn)
        else:
            qn = np.linalg.norm(Q, axis=1)
            M = (Q @ B.T) / np.outer(
                np.where(qn == 0, 1.0, qn), np.where(cn == 0, 1.0, cn)
            )
        qid = qdf["q_id"].to_numpy()
        cid = cdf["vec_id"].to_numpy()
        M[qid[:, None] == cid[None, :]] = -np.inf
        if mismatch_cols:
            ql = qdf[mismatch_cols[0]].to_numpy()
            cl = cdf[mismatch_cols[1]].to_numpy()
            mask = ql[:, None] == cl[None, :]
            if fold_order:
                # SQL three-valued `<>`: a NULL label on either side
                # drops the pair (the row path's filter semantics)
                qnull = pd.isna(ql)
                cnull = pd.isna(cl)
                mask = mask | qnull[:, None] | cnull[None, :]
            M[mask] = -np.inf
        kk = min(k, M.shape[1])
        # fully vectorized per-row top-k with the (-cos, vec_id) tiebreak:
        # argpartition selects, then a stable sort by vec_id followed by a
        # stable sort by -cos orders each row (a per-row Python loop here
        # measured 10x the matmul cost at 100k+ probe rows)
        part = np.argpartition(-M, kk - 1, axis=1)[:, :kk]
        pv = np.take_along_axis(M, part, axis=1)
        pc = cid[part]
        o1 = np.argsort(pc, axis=1, kind="stable")
        pv = np.take_along_axis(pv, o1, axis=1)
        pc = np.take_along_axis(pc, o1, axis=1)
        o2 = np.argsort(-pv, axis=1, kind="stable")  # ties keep vec_id asc
        pv = np.take_along_axis(pv, o2, axis=1)
        pc = np.take_along_axis(pc, o2, axis=1)
        keep = ~np.isneginf(pv)
        q_rep = np.broadcast_to(qid[:, None], pv.shape)
        return pd.DataFrame(
            {"q_id": q_rep[keep], "vec_id": pc[keep], "cos": pv[keep]}
        )

    scored = (
        probe.groupBy("bucket")
        .cogroup(cand.groupBy("bucket"))
        .applyInPandas(lambda lp, rp: score(lp, rp), schema=out_schema)
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def ivf_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Incremental index maintenance: bucket NEW vectors against the
    EXISTING centroids — no retrain, no shuffle (the centroid table is a
    literal array; assignment is an argmin column expression).  The
    standard IVF lifecycle at 100 TB: train the quantizer once on a
    sample, assign every arriving batch with this, re-train only on
    measured drift (bucket-occupancy skew).  Output schema matches
    ivf_build's index, so the new rows union/MERGE straight into it."""
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    return _assign_bucket(base, centroids)


def _assign_bucket(base: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Shared frozen-centroid assignment over a (vec_id, emb) frame.

    One Arrow-batched matmul assigns a whole batch (same pattern as the
    LSH plane projections): k×d distances per row as per-row HOF folds
    are k*d interpreted lambda evaluations each — measured seconds at
    only 2000×16×64 — where ``X @ C.T`` is one BLAS call.  Ties break to
    the smaller bucket id (np.argmin takes the first minimum), matching
    the column-expression formulation this replaced."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")  # k x d, unit-normalized
    c2 = (C * C).sum(1)

    @pandas_udf("nrm double, bucket int")
    def assign(e: pd.Series) -> pd.DataFrame:
        X = np.stack(e.to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        Xn = X / np.where(nrm == 0, 1.0, nrm)[:, None]
        # ||xn||^2 is constant 1 — argmin over c2 - 2 xn·c matches the
        # full spherical distance
        b = (c2[None, :] - 2.0 * (Xn @ C.T)).argmin(1)
        return pd.DataFrame({"nrm": nrm, "bucket": b.astype("int32")})

    # asNondeterministic: the UDF IS deterministic per row, but a
    # downstream filter on ``bucket`` (ivfpq_search_blocked's probed-
    # cell pruning) gets pushed below this projection and the optimizer
    # then evaluates the UDF TWICE per row — once under the pushed
    # filter, once in the surviving projection (two ArrowEvalPython
    # nodes in the round-8 before-plan, guide §4.4).  Marking it
    # non-deterministic forbids the duplication; the filter runs once,
    # above a single assignment pass.  Results are unchanged — the
    # flag only restricts optimizer reordering.
    assign = assign.asNondeterministic()

    # passthrough columns (e.g. a label for mismatch-constrained k-NN)
    # ride the assignment projection — the alternative is a corpus-wide
    # equi-join back onto the index to re-attach them (a third scan +
    # shuffle join of the corpus with itself in the round-8 knn plan)
    extra = [c for c in base.columns if c not in ("vec_id", "emb")]
    return base.withColumn("__a", assign(F.col("emb"))).select(
        "vec_id", "emb", *extra,
        F.col("__a.nrm").alias("nrm"), F.col("__a.bucket").alias("bucket"),
    )


def embedding_quantize_int8(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Scalar int8 quantization of an embedding column: per-dimension
    [min, max] over the corpus (one tiny aggregate) maps each component
    onto 256 levels stored as ``array<tinyint>`` — 8x smaller than
    float64 in memory and ~4x on parquet, which at a 100 TB embedding
    corpus is the difference between an index that fits the cluster and
    one that doesn't. Returns (quantized frame, per-dim ranges); ranges
    are the codebook — persist them next to the table.

    Quantize/dequantize are pure zip_with column expressions (no UDF);
    recall impact is gated in tests (dequantized top-k vs float top-k).
    """
    dims = (
        emb.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    ranges = [(r["mn"], r["mx"]) for r in dims]
    mins = F.array(*[F.lit(mn) for mn, _ in ranges])
    spans = F.array(*[F.lit((mx - mn) if mx > mn else 1.0) for mn, mx in ranges])
    shifted = F.zip_with(F.col(vec_col).cast("array<double>"), mins, lambda x, mn: x - mn)
    q = F.zip_with(
        shifted,
        spans,
        lambda d, s: (F.round(d / s * 255.0, 0) - 128).cast("tinyint"),
    )
    return emb.withColumn("q_embedding", q).drop(vec_col), ranges


def embedding_dequantize(
    qemb: DataFrame, ranges: list[tuple[float, float]], out_col: str = "embedding"
) -> DataFrame:
    """Inverse map back to ``array<double>`` (codebook as literals):
    value = min + (q + 128) / 255 * span. Max reconstruction error is
    span / 510 per component."""
    mins = F.array(*[F.lit(mn) for mn, _ in ranges])
    spans = F.array(*[F.lit((mx - mn) if mx > mn else 1.0) for mn, mx in ranges])
    # zip_with pairs two arrays, so chain: q -> scaled span, then + min
    scaled = F.zip_with(
        F.col("q_embedding"), spans, lambda q, s: (q.cast("double") + 128.0) / 255.0 * s
    )
    deq = F.zip_with(scaled, mins, lambda u, mn: u + mn)
    return qemb.withColumn(out_col, deq)


def gram_matrix(emb: DataFrame, col: str = "emb"):
    """Distributed d x d Gram/second-moment accumulation: one numpy
    ``X.T @ X`` per Arrow batch inside mapInPandas (C-speed, no Python
    row loop), partial matrices summed with one tiny shuffle (each
    partial is d*d doubles + a count — for d=64 that is 32 KiB per
    partition regardless of row count).  Returns (S, n, mean) on the
    driver.  This is the mergeable-summary shape again: the full pass
    over 100 TB of vectors reduces to partitions x 32 KiB."""
    import numpy as np
    import pandas as pd

    probe = emb.select(F.size(col).alias("d")).first()
    d = probe["d"]

    def partials(batches):
        S = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            X = np.stack(pdf["__v"].to_numpy())
            S += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"S": [S.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = (
        emb.select(F.col(col).cast("array<double>").alias("__v"))
        .mapInPandas(partials, "S array<double>, s array<double>, n long")
        .collect()
    )
    S = sum(np.array(r["S"]).reshape(d, d) for r in parts)
    s = sum(np.array(r["s"]) for r in parts)
    n = sum(r["n"] for r in parts)
    return S, n, s / n


def pca_project(emb: DataFrame, k: int, col: str = "emb", out_col: str = "pca"):
    """Distributed PCA: covariance from the Gram pass (one scan),
    eigendecomposition of the tiny d x d matrix on the driver (numpy,
    deterministic sign fix), projection pushed back as a pure column
    expression — a k x d literal matrix of dot products in codegen, no
    Python in the projection path.  Returns (df with ``out_col``,
    explained_variance_ratio list).  Standard embedding whitening
    before ANN/dedup; components are descending-eigenvalue ordered."""
    import numpy as np

    S, n, mean = gram_matrix(emb, col)
    cov = S / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                   # k x d
    # deterministic orientation: largest-|coord| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    evr = (vals[order] / vals.sum()).tolist()
    d = comps.shape[1]
    centered = F.transform(
        F.col(col).cast("array<double>"),
        lambda x, i: x - F.element_at(F.array(*[F.lit(float(m)) for m in mean]), i + 1),
    )
    proj = F.array(*[
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(v)) for v in comps[i]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for i in range(comps.shape[0])
    ])
    return emb.withColumn(out_col, proj), evr


def ivf_persist(
    warehouse, table: str, emb: DataFrame, k_centroids: int = 16, seed: int = 42
) -> int:
    """Persist the IVF index as a warehouse table PARTITIONED BY bucket
    (one directory per coarse cell) plus a tiny ``<table>__centroids``
    side table.  The payoff at 100 TB: a probe reads nprobe/k_centroids
    of the index as *directory-level partition pruning* — the unprobed
    cells are never even listed, let alone scanned (PartitionFilters in
    the executed plan, pinned in tests).  Versioned like any warehouse
    table, so index rebuilds are atomic pointer swaps and searches are
    reproducible against a pinned version."""
    indexed, centroids = ivf_build(emb, k_centroids=k_centroids, seed=seed)
    v = warehouse.write(table, indexed, partition_by=["bucket"])
    cent_rows = [(i, c) for i, c in enumerate(centroids)]
    cent_df = indexed.sparkSession.createDataFrame(
        cent_rows, "bucket int, centroid array<double>"
    )
    warehouse.write(f"{table}__centroids", cent_df)
    return v


def ivf_search_persisted(
    warehouse,
    table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    max_queries: int = 10_000,
) -> DataFrame:
    """Search the persisted index: centroids load driver-side (tiny),
    the union of every query's nprobe nearest buckets becomes a static
    ``bucket IN (...)`` predicate — so the index scan prunes to the
    probed partitions before any row is read — and the pruned index
    flows through the same exact-rerank ivf_search.

    CONTRACT: this is the POINT-LOOKUP path — the query set is collected
    to the driver (that is what enables the static partition-pruning
    predicate). It refuses more than ``max_queries`` rows instead of
    OOMing the driver; bulk both-sides-large search belongs to
    :func:`knn_join`, which keeps both sides distributed and meets them
    inside shared IVF cells."""
    import numpy as np

    cent_rows = warehouse.read(f"{table}__centroids").collect()
    centroids = [
        c["centroid"] for c in sorted(cent_rows, key=lambda r: r["bucket"])
    ]
    C = np.array(centroids)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    q_local = queries.select("q_id", "q_emb").limit(max_queries + 1).collect()
    if len(q_local) > max_queries:
        raise ValueError(
            f"ivf_search_persisted collects the query side driver-side and got "
            f"more than max_queries={max_queries} rows; use knn_join for bulk "
            "(both-sides-large) nearest-neighbor search, or raise max_queries "
            "if the driver can hold the query set"
        )
    probed: set[int] = set()
    for r in q_local:
        q = np.array(r["q_emb"], dtype=float)
        qn = q / (np.linalg.norm(q) or 1.0)
        d2 = ((Cn - qn) ** 2).sum(axis=1)
        probed.update(int(b) for b in np.argsort(d2)[:nprobe])
    index = warehouse.read(table).where(F.col("bucket").isin(sorted(probed)))
    return ivf_search(index, centroids, queries, k=k, nprobe=nprobe)


def semantic_dedup_pairs(
    emb: DataFrame,
    tau: float = 0.99,
    k_centroids: int = 8,
    seed: int = 42,
    probe: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with a spherical
    KMeans quantizer, generate candidate pairs ONLY within a cluster
    cell, verify each candidate with the exact cosine, keep pairs with
    cos >= tau.

    Why this survives 100 TB where all-pairs cannot: the pair space is
    bounded per cell at (n/k)^2 instead of n^2 — k grows with the corpus
    (SemDeDup uses ~n/10k clusters) so per-cell work stays constant and
    cells are embarrassingly parallel. Precision is exactly 1.0 by
    construction (every emitted pair passed the exact cosine); the only
    approximation is recall — a pair split across cells is missed. Each
    vector is therefore assigned to its ``probe`` nearest centroids
    (multi-assignment), which makes boundary splits exponentially
    unlikely for genuinely-near pairs: vectors at cosine >= 0.99 have
    near-identical centroid distances, so their probe sets overlap.

    ``emb``: (vec_id, emb array<double>). Returns (vec_a, vec_b, cos)
    with vec_a < vec_b, distinct pairs.
    """
    indexed, centroids = ivf_build(
        emb.select("vec_id", F.col("emb").alias("embedding")), k_centroids=k_centroids, seed=seed
    )
    # multi-assign each vector to its `probe` nearest cells (same argmin
    # expression as ivf_search's query-side probing)
    cents = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    qn = _l2_normalize(F.col("emb"))
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(c, qn, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )
    n_cent = len(centroids)
    assigned = indexed.select("vec_id", "emb", "nrm").withColumn(
        "bucket",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.zip_with(
                            dists,
                            F.sequence(F.lit(0), F.lit(n_cent - 1)),
                            lambda d, i: F.struct(d.alias("d"), i.alias("bucket")),
                        )
                    ),
                    1,
                    probe,
                ),
                lambda s: s["bucket"],
            )
        ),
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                _dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .where(F.col("cos") >= tau)
        # order-free dedup: cos is bit-identical across duplicate pair
        # rows, so min == the value and survives task retry unchanged
        # (dropDuplicates' first() does not — determinism lint)
        .groupBy("vec_a", "vec_b")
        .agg(F.min("cos").alias("cos"))
    )
    return pairs


def semantic_dedup_pairs_blocked(
    emb: DataFrame,
    tau: float = 0.99,
    k_centroids: int = 8,
    seed: int = 42,
    probe: int = 2,
) -> DataFrame:
    """Block-matmul PRODUCTION twin of :func:`semantic_dedup_pairs`
    (same contract: (vec_a, vec_b, cos), vec_a < vec_b, distinct): each
    cluster cell scores ALL its pairs with one ``Xn @ Xn.T`` BLAS call
    inside applyInPandas and emits only the >= tau survivors — the
    embeddings never ride a pair join, so the shuffled volume is
    O(n * probe * dim) for the cell assignment plus the (tiny) survivor
    pairs, instead of (n/k)^2 * k pairs x dim through the self-join.
    Per-cell working memory is (cell x dim) + (cell x cell) floats —
    bounded by k_centroids, which grows with the corpus (SemDeDup uses
    ~n/10k cells).  Multi-probe assignment duplicates boundary pairs
    into up to probe^2 shared cells; the min-cos groupBy dedupes them.
    The float-sum order inside the dot differs from the fold path
    (BLAS), so the hash-oracled catalog entry keeps
    ``semantic_dedup_pairs``; this twin is pinned pair-set-equal in
    pytest."""
    from pyspark.sql.functions import pandas_udf

    indexed, centroids = ivf_build(
        emb.select("vec_id", F.col("emb").alias("embedding")),
        k_centroids=k_centroids,
        seed=seed,
    )
    C = np.asarray(centroids, dtype="float64")
    c2 = (C * C).sum(1)
    npr = min(probe, len(centroids))

    @pandas_udf("array<int>")
    def probes(e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        Xn = X / np.where(nrm == 0, 1.0, nrm)[:, None]
        D = c2[None, :] - 2.0 * (Xn @ C.T)
        idx = np.argsort(D, axis=1, kind="stable")[:, :npr]
        return pd.Series(list(idx.astype("int32")))

    assigned = indexed.select(
        "vec_id", "emb", F.explode(probes(F.col("emb"))).alias("bucket")
    )

    it = dict(emb.select("vec_id", "emb").dtypes)["vec_id"]
    out_schema = f"vec_a {it}, vec_b {it}, cos double"
    empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["emb"].to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        Xn = X / np.where(nrm == 0, 1.0, nrm)[:, None]
        M = Xn @ Xn.T
        ia, ib = np.triu_indices(len(ids), k=1)  # sorted ids -> vec_a < vec_b
        keep = M[ia, ib] >= tau
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "cos": M[ia, ib][keep]}
        )

    return (
        assigned.groupBy("bucket")
        .applyInPandas(lambda pdf: cell(pdf), schema=out_schema)
        .groupBy("vec_a", "vec_b")
        .agg(F.min("cos").alias("cos"))  # dedupe multi-probe duplicates
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    k_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    candidate_filter=None,
    mismatch_cols: tuple[str, str] | None = None,
    fold_order: bool = False,
) -> DataFrame:
    """Approximate k-NN JOIN: every row of ``left`` (q_id, q_emb) gets
    its k nearest ``right`` rows (vec_id, emb[, extra cols]) by cosine
    — both sides large.  The exact formulation is a cross join
    (|L|x|R| pairs — the first casualty at 100 TB); here both sides
    meet only inside shared IVF cells: right is bucketed once by the
    coarse quantizer, left probes its ``nprobe`` nearest cells, and the
    equi-join on bucket bounds the pair space to ~nprobe/k_centroids of
    the cross product, tunable recall-vs-cost.  With a label-mismatch
    constraint this is hard-negative mining for contrastive training
    (the quality upgrade over the ring-sampled ``negative_pairs``:
    nearest WRONG-class examples, not random ones).  Recall-gated in
    tests against the brute-force join.

    Two scoring paths: the default is the block-matmul search
    (``ivf_search_blocked``; pass the label constraint as
    ``mismatch_cols=(q_col, cand_col)``) — embeddings never ride the
    pair join and dots run in BLAS.  Passing an arbitrary
    ``candidate_filter`` Column routes through the row-expression
    ``ivf_search``, which also pins the float-sum order the
    exact-attestation oracles hash.
    """
    # non-embedding payload columns (e.g. the mismatch label) ride the
    # assignment projection into the index instead of a corpus-wide
    # equi-join back onto it — one scan and one shuffle join fewer
    # (round 8: the rejoin was a third full scan of `right` in the plan)
    extra = [c for c in right.columns if c not in {"vec_id", "embedding"}]
    indexed, centroids = ivf_build(
        right, k_centroids=k_centroids, seed=seed, extra_cols=extra or None
    )
    if candidate_filter is not None:
        return ivf_search(
            indexed, centroids, left, k=k, nprobe=nprobe,
            candidate_filter=candidate_filter,
        )
    return ivf_search_blocked(
        indexed, centroids, left, k=k, nprobe=nprobe,
        mismatch_cols=mismatch_cols, fold_order=fold_order,
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    q_col: str = "q_id",
    id_col: str = "vec_id",
    rel_col: str = "cos",
    emb_col: str = "emb",
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    greedily pick k candidates per query maximizing
    ``lam * relevance - (1 - lam) * max-cosine-to-already-picked`` —
    the standard diversification pass after a retrieval top-n, so the
    final k results are not n near-duplicates of each other.

    Input is one row per (query, candidate) with the retrieval score in
    ``rel_col`` and the candidate embedding in ``emb_col`` (i.e. the
    output of ``sim_topk``/``ivf_search`` joined back to embeddings).
    Scale shape: per-query pools are bounded by the upstream top-n
    (~10^2), so each group is one local n x n matmul plus an O(n*k)
    greedy loop inside ``applyInPandas`` over ``q_col`` —
    embarrassingly parallel across queries, no pairwise shuffle, and
    only k rows per query leave Python.  Ties break to the lowest
    candidate id (candidates are processed id-sorted and argmax takes
    the first maximum), so the result is deterministic under any
    partitioning.  Returns ``(q_col, id_col, mmr_rank)``.
    """
    qt = dict(candidates.dtypes)[q_col]
    it = dict(candidates.dtypes)[id_col]
    out_schema = f"{q_col} {qt}, {id_col} {it}, mmr_rank int"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        rel = pdf[rel_col].to_numpy().astype("float64")[order]
        B = np.stack(pdf[emb_col].to_numpy())[order].astype("float64")
        nrm = np.linalg.norm(B, axis=1)
        Bn = B / np.where(nrm == 0, 1.0, nrm)[:, None]
        S = Bn @ Bn.T
        n = len(ids)
        sel: list[int] = []
        avail = np.ones(n, dtype=bool)
        kk = min(k, n)
        for _ in range(kk):
            pen = S[:, sel].max(axis=1) if sel else np.zeros(n)
            sc = lam * rel - (1.0 - lam) * pen
            sc[~avail] = -np.inf
            i = int(np.argmax(sc))  # first max -> lowest id on ties
            sel.append(i)
            avail[i] = False
        return pd.DataFrame(
            {
                q_col: np.repeat(pdf[q_col].iloc[0], kk),
                id_col: ids[sel],
                "mmr_rank": np.arange(1, kk + 1, dtype="int32"),
            }
        )

    return candidates.groupBy(q_col).applyInPandas(pick, schema=out_schema)


def mmr_reference(
    q: list[float], cands: dict, k: int, lam: float = 0.5
) -> list:
    """Pure-Python MMR (test oracle): same greedy argmax with the
    lowest-id tiebreak, relevance = cosine(q, cand)."""
    ids = sorted(cands)
    B = np.array([cands[i] for i in ids], dtype="float64")
    Bn = B / np.linalg.norm(B, axis=1)[:, None]
    qv = np.asarray(q, dtype="float64")
    qn = qv / np.linalg.norm(qv)
    rel = Bn @ qn
    S = Bn @ Bn.T
    sel: list[int] = []
    avail = list(range(len(ids)))
    for _ in range(min(k, len(ids))):
        scored = []
        for i in avail:
            pen = max(S[i][j] for j in sel) if sel else 0.0
            scored.append((lam * rel[i] - (1 - lam) * pen, ids[i], i))
        scored.sort(key=lambda t: (-t[0], t[1]))
        sel.append(scored[0][2])
        avail.remove(scored[0][2])
    return [ids[i] for i in sel]


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path.
# ---------------------------------------------------------------------------


def _bounded_train_sample(base: DataFrame, train_cap: int):
    """Deterministic bounded training sample (shared by the IVF and PQ
    quantizer builds): a ``limit(cap+1)`` probe avoids a full count at
    100 TB; over cap, double an id-hash modulus and re-probe —
    log2(n/cap) early-stopping probes replace the full scan, and the
    result is invariant to partitioning. Rows come back sorted by
    vec_id so the driver-side k-means sees a pinned order."""
    pdf = base.limit(train_cap + 1).toPandas()
    if len(pdf) > train_cap:
        m = 2
        while True:
            cand = base.where(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) == 0)
            pdf = cand.limit(train_cap + 1).toPandas()
            if len(pdf) <= train_cap:
                break
            m *= 2
    return pdf.sort_values("vec_id")


def pq_build(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
):
    """Train a product quantizer and encode every vector.

    The d-dim space splits into ``m`` orthogonal subspaces of d/m dims;
    each gets its own ``ksub``-centroid k-means codebook (driver-trained
    on the bounded deterministic sample, like the IVF coarse quantizer).
    A vector is stored as ``m`` small codes — at m=8, ksub=256 that is
    8 bytes instead of 512 (float64×64), the difference between an
    embedding index that fits executor memory at 100 TB and one that
    doesn't. Codebooks quantize the RAW subvectors (ADC approximates the
    raw inner product); exact norms ride along for the cosine
    denominator and for the exact re-rank.

    Returns (encoded df: vec_id, emb, nrm, codes array<int>; codebooks
    list[m][ksub][d/m]).
    """
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    pdf = _bounded_train_sample(base, train_cap)
    X = np.stack(pdf["emb"].to_numpy())
    d = X.shape[1]
    if d % m:
        raise ValueError(f"pq_build: dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    codebooks = []
    for s in range(m):
        sub = np.ascontiguousarray(X[:, s * dsub : (s + 1) * dsub])
        centers = _lloyd_kmeans(sub, ksub, seed + 7919 * s)
        codebooks.append([c.tolist() for c in centers])
    return pq_encode(base, codebooks), codebooks


def pq_encode(base: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Encode (vec_id, emb, ...) rows against FROZEN codebooks — the
    incremental-maintenance twin of ``ivf_assign``: new batches encode
    without retraining. One Arrow matmul per subspace per batch; ties
    break to the smaller code id (np.argmin first-minimum). Extra input
    columns (e.g. an IVF ``bucket``) pass through untouched."""
    from pyspark.sql.functions import pandas_udf

    Cs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    n_sub = len(Cs)
    dsub = Cs[0].shape[1]
    c2s = [(C * C).sum(1) for C in Cs]

    @pandas_udf("nrm double, codes array<int>")
    def enc(e: pd.Series) -> pd.DataFrame:
        X = np.stack(e.to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        codes = np.empty((len(X), n_sub), dtype="int32")
        for s in range(n_sub):
            sub = X[:, s * dsub : (s + 1) * dsub]
            codes[:, s] = (c2s[s][None, :] - 2.0 * (sub @ Cs[s].T)).argmin(1)
        return pd.DataFrame({"nrm": nrm, "codes": list(codes)})

    passthrough = [c for c in base.columns if c not in ("nrm", "codes")]
    return base.withColumn("__e", enc(F.col("emb"))).select(
        *passthrough,
        F.col("__e.nrm").alias("nrm"),
        F.col("__e.codes").alias("codes"),
    )


def pq_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 64,
    query_cap: int = 10_000,
) -> DataFrame:
    """ADC (asymmetric distance computation) search: per query, the dot
    products between its subvectors and every codebook entry form an
    m×ksub lookup table; a candidate's approximate inner product is then
    ``m`` table lookups instead of ``d`` multiplies — pure zip_with /
    aggregate column expressions over the broadcast query side, no UDF
    in the scan. The top-``shortlist`` by approximate cosine re-rank
    EXACTLY (same fold order as sim_topk_cosine, so shortlist >= corpus
    degenerates to brute force — the attestation mode).

    CONTRACT: the query side is collected driver-side to build the ADC
    tables (bounded by ``query_cap``, refuses instead of OOMing) — the
    point-lookup path, same contract as ivf_search_persisted; bulk
    search belongs to knn_join.
    """
    q_local = queries.select("q_id", "q_emb").limit(query_cap + 1).collect()
    if len(q_local) > query_cap:
        raise ValueError(
            f"pq_search builds per-query ADC tables driver-side and got more "
            f"than query_cap={query_cap} rows; use knn_join for bulk search "
            "or raise query_cap if the driver can hold the query set"
        )
    Cs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    dsub = Cs[0].shape[1]
    rows = []
    for r in q_local:
        q = np.asarray(r["q_emb"], dtype="float64")
        adc = [(Cs[s] @ q[s * dsub : (s + 1) * dsub]).tolist() for s in range(len(Cs))]
        rows.append((r["q_id"], [float(v) for v in q], adc))
    spark = encoded.sparkSession
    qdf = spark.createDataFrame(
        rows, "q_id bigint, q_emb array<double>, adc array<array<double>>"
    ).withColumn("q_nrm", _norm(F.col("q_emb")))

    pairs = encoded.crossJoin(F.broadcast(qdf)).where(F.col("vec_id") != F.col("q_id"))
    approx_dot = F.aggregate(
        F.zip_with("adc", "codes", lambda t, c: F.element_at(t, c + F.lit(1))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.withColumn("approx", approx_dot / (F.col("q_nrm") * F.col("nrm")))
    w1 = W.partitionBy("q_id").orderBy(F.col("approx").desc(), F.col("vec_id").asc())
    short = scored.withColumn("__r", F.row_number().over(w1)).where(
        F.col("__r") <= shortlist
    )
    rer = short.select(
        "q_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
            "cos"
        ),
    )
    w2 = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        rer.withColumn("rank_in_group", F.row_number().over(w2).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def pq_search_blocked(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 64,
    query_cap: int = 10_000,
) -> DataFrame:
    """Production ADC search: one mapInPandas pass scores every batch
    against ALL queries with numpy fancy-indexed table lookups
    (``adc[:, arange(m), codes]`` — a gather, no per-row lambdas),
    keeps each batch's local top-``shortlist`` per query, computes the
    EXACT cosine for those survivors in-batch (one small matmul), and
    a final per-query window takes global top-k. Per-partition
    shortlists are a superset of the global shortlist, so recall is
    >= the column-expression path's at equal ``shortlist``.

    The same fold-vs-BLAS float-order split as ivf_search vs
    ivf_search_blocked: exact-attestation oracles keep ``pq_search``,
    recall-gated production configs use this. Measured at 2M x 64:
    77 s -> ~2 s for 5 queries (the zip_with/aggregate lookup fold is
    ~80M interpreted lambda evaluations; the gather is one C pass).
    """
    q_local = queries.select("q_id", "q_emb").limit(query_cap + 1).collect()
    if len(q_local) > query_cap:
        raise ValueError(
            f"pq_search_blocked builds per-query ADC tables driver-side and "
            f"got more than query_cap={query_cap} rows; use knn_join for bulk "
            "search or raise query_cap if the driver can hold the query set"
        )
    q_local.sort(key=lambda r: r["q_id"])
    Cs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    m = len(Cs)
    dsub = Cs[0].shape[1]
    Q = np.stack([np.asarray(r["q_emb"], dtype="float64") for r in q_local])
    qids = np.asarray([r["q_id"] for r in q_local])
    qn = np.linalg.norm(Q, axis=1)
    qn = np.where(qn == 0, 1.0, qn)
    # n_q x m x ksub ADC tables: dot(query subvector, codebook entry)
    ADC = np.stack(
        [
            np.stack([Cs[s] @ q[s * dsub : (s + 1) * dsub] for s in range(m)])
            for q in Q
        ]
    )
    ct = dict(encoded.dtypes)["vec_id"]
    out_schema = f"q_id bigint, vec_id {ct}, cos double"

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # B x m
            X = np.stack(pdf["emb"].to_numpy())  # B x d
            nrm = pdf["nrm"].to_numpy()
            cid = pdf["vec_id"].to_numpy()
            nrm_safe = np.where(nrm == 0, 1.0, nrm)
            # gather: approx[q, b] = sum_s ADC[q, s, codes[b, s]] via the
            # flattened (s * ksub + code) index — one C pass, no lambdas
            flat = ADC.reshape(len(Q), -1)  # n_q x (m * ksub)
            idx = np.arange(m)[None, :] * ADC.shape[2] + codes  # B x m
            approx = flat[:, idx].sum(2)  # n_q x B
            approx = approx / np.outer(qn, nrm_safe)
            approx[qids[:, None] == cid[None, :]] = -np.inf
            kk = min(shortlist, approx.shape[1])
            part = np.argpartition(-approx, kk - 1, axis=1)[:, :kk]
            # exact cosine only for the local shortlist survivors
            rows_q, rows_b, rows_c = [], [], []
            for qi in range(len(Q)):
                sel = part[qi][~np.isneginf(approx[qi, part[qi]])]
                if not len(sel):
                    continue
                exact = (X[sel] @ Q[qi]) / (qn[qi] * nrm_safe[sel])
                rows_q.append(np.full(len(sel), qids[qi]))
                rows_b.append(cid[sel])
                rows_c.append(exact)
            if rows_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(rows_q),
                        "vec_id": np.concatenate(rows_b),
                        "cos": np.concatenate(rows_c),
                    }
                )

    scored = encoded.select("vec_id", "emb", "nrm", "codes").mapInPandas(
        score, schema=out_schema
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


# ---------------------------------------------------------------------------
# IVF-PQ composition — coarse cells prune WHICH rows are scanned, PQ
# codes make the scan itself cheap: the standard billion-scale ANN
# index layout (FAISS IndexIVFPQ), here as the composition of the two
# operators above.
# ---------------------------------------------------------------------------


def ivfpq_build(
    emb: DataFrame,
    k_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
):
    """Build both index levels from ONE bounded training sample: the
    spherical IVF coarse quantizer buckets every vector (partition /
    file-skip key at 100 TB), and per-subspace PQ codebooks encode it
    (8 codes a row in the scan). Returns (encoded index frame:
    vec_id, emb, bucket, nrm, codes; centroids; codebooks)."""
    # ONE sampling job feeds both quantizer levels (round 8): ivf_build
    # and the PQ codebook train used to each run their own
    # _bounded_train_sample over the corpus — same derivation, same
    # cap, deterministic, so sharing the collected frame is provably
    # identical and halves the build's scan jobs.
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    pdf = _bounded_train_sample(base, train_cap)
    indexed, centroids = ivf_build(
        emb, k_centroids=k_centroids, seed=seed, train_cap=train_cap, _sample_pdf=pdf
    )
    X = np.stack(pdf["emb"].to_numpy())
    d = X.shape[1]
    if d % m:
        raise ValueError(f"ivfpq_build: dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    codebooks = []
    for s in range(m):
        sub = np.ascontiguousarray(X[:, s * dsub : (s + 1) * dsub])
        codebooks.append([c.tolist() for c in _lloyd_kmeans(sub, ksub, seed + 7919 * s)])
    encoded = pq_encode(indexed.drop("nrm"), codebooks)
    return encoded, centroids, codebooks


def _ivfpq_probe_frame(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    nprobe: int,
    query_cap: int,
    with_adc: bool = True,
    as_rows: bool = False,
):
    """Shared driver-side query prep: collect the bounded query set,
    pick each query's nprobe nearest coarse cells (spherical metric,
    ties to the smaller bucket id), and build its ADC tables. Returns
    a (q_id, q_emb[, adc], bucket) frame — one row per (query, probe).

    ``with_adc=False`` omits the nested array<array<double>> column:
    the fold path needs it as a column expression, but the blocked
    path recomputes the tables from q_emb inside the scorer (m x ksub
    dots per batch are trivial) — and this pyarrow build SEGFAULTS
    deserializing nested lists through the cogroup serializer, so the
    nested column must never ride an applyInPandas input."""
    q_local = queries.select("q_id", "q_emb").limit(query_cap + 1).collect()
    if len(q_local) > query_cap:
        raise ValueError(
            f"ivfpq search collects the query side driver-side and got more "
            f"than query_cap={query_cap} rows; use knn_join for bulk search"
        )
    q_local.sort(key=lambda r: r["q_id"])
    C = np.asarray(centroids, dtype="float64")
    Cs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    dsub = Cs[0].shape[1]
    npr = min(nprobe, len(centroids))
    rows = []
    for r in q_local:
        q = np.asarray(r["q_emb"], dtype="float64")
        qn = q / (np.linalg.norm(q) or 1.0)
        d2 = ((C - qn) ** 2).sum(1)
        buckets = np.argsort(d2, kind="stable")[:npr]
        if with_adc:
            adc = [
                (Cs[s] @ q[s * dsub : (s + 1) * dsub]).tolist() for s in range(len(Cs))
            ]
            rows.extend(
                (r["q_id"], [float(v) for v in q], adc, int(b)) for b in buckets
            )
        else:
            rows.extend((r["q_id"], [float(v) for v in q], int(b)) for b in buckets)
    if as_rows:  # blocked path: rows stay driver-local (closure state)
        return rows
    spark = encoded.sparkSession
    if with_adc:
        return spark.createDataFrame(
            rows,
            "q_id bigint, q_emb array<double>, adc array<array<double>>, bucket int",
        )
    return spark.createDataFrame(
        rows, "q_id bigint, q_emb array<double>, bucket int"
    )


def ivfpq_search(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 64,
    query_cap: int = 10_000,
) -> DataFrame:
    """Fold-order IVF-PQ search (the exact-attestation path): probe the
    nprobe nearest cells per query, ADC-score their members by code
    lookups (zip_with/aggregate), shortlist by approximate cosine,
    exact-rerank the survivors with the pinned-float-order fold. With
    nprobe = k_centroids AND shortlist >= corpus this provably equals
    brute force — the degeneracy the catalog oracle hashes. Production
    configs use :func:`ivfpq_search_blocked`."""
    probe = _ivfpq_probe_frame(
        encoded, centroids, codebooks, queries, nprobe, query_cap
    ).withColumn("q_nrm", _norm(F.col("q_emb")))
    cand = encoded.join(probe, on="bucket").where(F.col("vec_id") != F.col("q_id"))
    approx_dot = F.aggregate(
        F.zip_with("adc", "codes", lambda t, c: F.element_at(t, c + F.lit(1))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.withColumn("approx", approx_dot / (F.col("q_nrm") * F.col("nrm")))
    w1 = W.partitionBy("q_id").orderBy(F.col("approx").desc(), F.col("vec_id").asc())
    short = scored.withColumn("__r", F.row_number().over(w1)).where(
        F.col("__r") <= shortlist
    )
    rer = short.select(
        "q_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
            "cos"
        ),
    )
    w2 = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        rer.withColumn("rank_in_group", F.row_number().over(w2).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def ivfpq_search_blocked(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 64,
    query_cap: int = 10_000,
) -> DataFrame:
    """Production IVF-PQ search — ZERO-shuffle scan shape: the probed
    bucket set becomes a static ``bucket IN (...)`` predicate (with the
    index partitioned by bucket — ivf_persist's layout — that prunes at
    the directory level to nprobe/k_centroids of the data), and scoring
    is one mapInPandas pass whose closure holds the bucket -> probing-
    queries map. Each batch groups its rows by bucket (one np.unique),
    ADC-gathers every (cell-rows x probing-queries) block, exact-reranks
    the block-local top-``shortlist``, and only k rows per query reach
    the final window. Per-block shortlists are a superset of the global
    one, so recall >= the fold path's at equal dials.

    First cut cogrouped probe rows with index cells by bucket — that
    SHUFFLES the whole encoded index (2M rows: 9.3 s, barely beating
    the unpruned PQ scan at 11.2 s); this shape measures ~2 s because
    cell pruning cuts compute without moving any index row."""
    m = len(codebooks)
    Cs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    dsub = Cs[0].shape[1]
    ksub = Cs[0].shape[0]
    probe = _ivfpq_probe_frame(
        encoded, centroids, codebooks, queries, nprobe, query_cap,
        with_adc=False, as_rows=True,
    )
    by_q: dict[int, list[float]] = {}
    probed_of: dict[int, list[int]] = {}
    for q_id, q_emb, bucket in probe:
        by_q[q_id] = q_emb
        probed_of.setdefault(int(bucket), []).append(q_id)
    qids_sorted = sorted(by_q)
    qpos = {q: i for i, q in enumerate(qids_sorted)}
    Q = np.stack([np.asarray(by_q[q], dtype="float64") for q in qids_sorted])
    qn = np.linalg.norm(Q, axis=1)
    qn = np.where(qn == 0, 1.0, qn)
    qid_arr = np.asarray(qids_sorted)
    ADC = np.empty((len(Q), m, ksub))
    for s in range(m):
        ADC[:, s, :] = Q[:, s * dsub : (s + 1) * dsub] @ Cs[s].T
    flatADC = ADC.reshape(len(Q), -1)
    probing = {b: np.asarray([qpos[q] for q in qs]) for b, qs in probed_of.items()}

    cand = encoded.select("vec_id", "emb", "nrm", "codes", "bucket").where(
        F.col("bucket").isin(sorted(probing))
    )
    ct = dict(encoded.dtypes)["vec_id"]
    out_schema = f"q_id bigint, vec_id {ct}, cos double"

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            buckets = pdf["bucket"].to_numpy()
            codes_all = np.stack(pdf["codes"].to_numpy())
            X_all = np.stack(pdf["emb"].to_numpy())
            nrm_all = pdf["nrm"].to_numpy()
            cid_all = pdf["vec_id"].to_numpy()
            rows_q, rows_b, rows_c = [], [], []
            for b in np.unique(buckets):
                qsel = probing.get(int(b))
                if qsel is None:
                    continue
                mask = buckets == b
                codes = codes_all[mask]
                X = X_all[mask]
                nrm_safe = np.where(nrm_all[mask] == 0, 1.0, nrm_all[mask])
                cid = cid_all[mask]
                idx = np.arange(m)[None, :] * ksub + codes
                approx = flatADC[qsel][:, idx].sum(2) / np.outer(
                    qn[qsel], nrm_safe
                )
                approx[qid_arr[qsel][:, None] == cid[None, :]] = -np.inf
                kk = min(shortlist, approx.shape[1])
                part = np.argpartition(-approx, kk - 1, axis=1)[:, :kk]
                for row, qi in enumerate(qsel):
                    sel = part[row][~np.isneginf(approx[row, part[row]])]
                    if not len(sel):
                        continue
                    exact = (X[sel] @ Q[qi]) / (qn[qi] * nrm_safe[sel])
                    rows_q.append(np.full(len(sel), qid_arr[qi]))
                    rows_b.append(cid[sel])
                    rows_c.append(exact)
            if rows_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(rows_q),
                        "vec_id": np.concatenate(rows_b),
                        "cos": np.concatenate(rows_c),
                    }
                )

    scored = cand.mapInPandas(score, schema=out_schema)
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank_in_group", F.row_number().over(w).cast("int"))
        .where(F.col("rank_in_group") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank_in_group")
    )


def ivfpq_persist(
    warehouse,
    table: str,
    emb: DataFrame,
    k_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
) -> int:
    """Persist the composed IVF-PQ index: the encoded frame PARTITIONED
    BY bucket (one directory per coarse cell — a probe lists only
    nprobe/k_centroids of the index) plus two tiny side tables,
    ``<table>__centroids`` and ``<table>__codebooks`` (flattened
    (subspace, code, centroid) rows — nested list-of-list columns stay
    out of storage schemas for the same serializer reasons as the
    cogroup hazard). Versioned like any warehouse table: rebuilds are
    atomic pointer swaps, searches reproduce against a pinned version,
    and new batches append via pq_encode against the frozen side
    tables."""
    encoded, centroids, codebooks = ivfpq_build(
        emb, k_centroids=k_centroids, m=m, ksub=ksub, seed=seed
    )
    v = warehouse.write(table, encoded, partition_by=["bucket"])
    spark = encoded.sparkSession
    warehouse.write(
        f"{table}__centroids",
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "bucket int, centroid array<double>",
        ),
    )
    warehouse.write(
        f"{table}__codebooks",
        spark.createDataFrame(
            [
                (s, j, list(code))
                for s, cb in enumerate(codebooks)
                for j, code in enumerate(cb)
            ],
            "subspace int, code int, centroid array<double>",
        ),
    )
    return v


def ivfpq_search_persisted(
    warehouse,
    table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 64,
    query_cap: int = 10_000,
) -> DataFrame:
    """Search the persisted IVF-PQ index: both side tables load
    driver-side (k_centroids + m*ksub tiny rows), the probed-cell union
    becomes a static ``bucket IN (...)`` predicate — directory-level
    partition pruning before any row is read — and the pruned scan
    flows through the zero-shuffle blocked scorer."""
    cent_rows = warehouse.read(f"{table}__centroids").collect()
    centroids = [
        c["centroid"] for c in sorted(cent_rows, key=lambda r: r["bucket"])
    ]
    cb_rows = warehouse.read(f"{table}__codebooks").collect()
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in cb_rows:
        by_sub.setdefault(r["subspace"], {})[r["code"]] = r["centroid"]
    codebooks = [
        [by_sub[s][j] for j in sorted(by_sub[s])] for s in sorted(by_sub)
    ]
    encoded = warehouse.read(table)
    # ivfpq_search_blocked re-derives the probed set and applies its own
    # bucket IN filter over this frame — partition pruning composes with
    # the warehouse's file-stats skipping.
    return ivfpq_search_blocked(
        encoded, centroids, codebooks, queries,
        k=k, nprobe=nprobe, shortlist=shortlist, query_cap=query_cap,
    )
