"""Distributed Bloom-filter membership — the broadcastable prefilter.

§2.12 extension: at 100 TB the question "is this key in the blocklist /
already-ingested set / contamination list?" must NOT cost a join against
the key set per probe row.  A Bloom filter answers it with a bitmap
small enough to broadcast: k deterministic hash positions per key, a
bit-OR'd bitmap of the member set, and a probe that is pure projection
+ one broadcast hash join on the bitmap's word index (m/64 rows — a few
hundred bytes).  False positives are possible (and DETERMINISTIC here),
false negatives are not; callers route maybe-hits to the exact check,
which is the standard two-tier shape (same discipline as the binned
drift monitors: cheap screen, exact attestation).

Hashing is the repo's engine-neutral md5 hex-polynomial (ascii values
of the first 8 hex chars, base-131 polynomial on BIGINT, mod m) so a
DuckDB oracle reproduces positions — and therefore the exact
maybe-member verdicts INCLUDING false positives — bit-for-bit.
Everything is native column expressions: no Python UDFs.  Two probe
shapes: the sparse join form (bitmap stays a DataFrame, mergeable,
oracle-attested) and the packed form (bitmap densified driver-side
within a documented bound and embedded as ONE binary plan literal —
zero shuffle, zero join; see DEVNOTES #54 for the three rejected
alternatives).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

BLOOM_M_BITS = 4096  # bitmap width (64 longs); power of two not required
BLOOM_K = 3  # hash positions per key


_POLY_CHARS = 8  # 16^8 distinct inputs — entropy must exceed any sane m_bits


def _position(key_col: str, i: int, m_bits: int) -> Column:
    """Deterministic position i in [0, m_bits): base-131 polynomial of
    the ascii values of md5(key || '|' || i)'s first 8 hex chars —
    reproducible in any engine with md5/ascii/substring.  8 chars give
    16^8 ~= 4.3e9 distinct inputs (4 would cap the position set at
    65536 and saturate any bitmap past m=2^16); the polynomial tops out
    ~6.8e16, so the arithmetic must ride BIGINT on both engines.

    Built as ONE server-parsed SQL string, not ~40 py4j Column calls
    (DEVNOTES #43): plan CONSTRUCTION is a per-query cost, and the
    round-8 split measured the bloom lane spending 0.65 s/execution
    building its expression tree against 0.5 s executing it.  The ops
    are all-integer, so the stringified AST is value-exact against the
    Column form it replaced."""
    h = f"md5(CAST(concat(`{key_col}`, '|{i}') AS BINARY))"
    poly = f"CAST(ascii(substring({h}, 1, 1)) AS BIGINT)"
    for j in range(2, _POLY_CHARS + 1):
        poly = f"(({poly} * 131) + ascii(substring({h}, {j}, 1)))"
    return F.expr(f"(({poly}) % {m_bits})")


def position_sql(key_sql: str, i: int, m_bits: int) -> str:
    """The DuckDB-SQL mirror of :func:`_position` (oracle side)."""
    h = f"md5({key_sql} || '|{i}')"
    poly = f"CAST(ascii(substr({h}, 1, 1)) AS BIGINT)"
    for j in range(2, _POLY_CHARS + 1):
        poly = f"({poly} * 131 + ascii(substr({h}, {j}, 1)))"
    return f"({poly} % {m_bits})"


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Member keys -> Bloom bitmap as (word_idx int, word long) rows.

    One explode (k positions per key) + one map-side-combined bit_or
    aggregation; the result is at most m_bits/64 rows regardless of the
    member count, so the shuffle moves O(partitions * m/64) longs and
    the output broadcasts anywhere.  Duplicate keys are harmless
    (idempotent OR)."""
    pos = keys.select(
        F.explode(
            F.array(*[_position(key_col, i, m_bits) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom verdicts per distinct probe key: (key, maybe_member) with
    maybe_member true iff ALL k of the key's bit positions are set.

    Shape: explode the k (word_idx, mask) probes per row, LEFT join the
    broadcast bitmap on word_idx (absent word = bit clear), then one
    map-side-combined count of hits back to one row per key.  The probe
    relation is touched once and nothing about the member set's
    cardinality appears anywhere in the plan; callers needing the
    verdict on a wide row join this (or inline the same expressions as
    a projection).  No false negatives by construction; false positives
    are deterministic given (m, k)."""
    checks = probe.select(
        key_col,
        F.posexplode(
            F.array(*[_position(key_col, i, m_bits) for i in range(k)])
        ).alias("i", "pos"),
    ).select(
        key_col,
        "i",
        (F.col("pos") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
            "mask"
        ),
    )
    return (
        checks.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            ).cast("int").alias("hit"),
        )
        .groupBy(key_col)
        .agg((F.sum("hit") == k).alias("maybe_member"))
    )


def bloom_probe_inline(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom verdict as a PROJECTION over the caller's rows — the probe
    side never shuffles (round 8, guide §2.4): ``k`` broadcast LEFT
    joins on the word index (each against the same tiny
    (word_idx, word) relation; an absent word means the bit is clear),
    then one AND over the ``k`` bit tests.  Unlike :func:`bloom_probe`
    there is no per-key regroup — no ``distinct``, no ``groupBy(key)``,
    no join back to the wide row — so at corpus scale the probe side is
    pure map work (the lane this replaced spent three exchanges moving
    probe keys: distinct + verdict regroup + re-join).  Adds a
    ``maybe_member`` column and preserves every input column.  NULL
    keys hash to NULL positions, miss every join, and read
    ``maybe_member = false`` — the same net verdict their rows got from
    the equi-join consumers of :func:`bloom_probe` (a NULL key never
    matches back).  Verdicts are bit-identical to :func:`bloom_probe`:
    same ``_position`` polynomial, same word/mask split."""
    # two batched selects, then the k joins — plan CONSTRUCTION is a
    # per-query cost and a withColumn-per-column chain here measured
    # ~0.12 s/execution of pure py4j round-trips (DEVNOTES #43)
    out = df.select(
        "*",
        *[_position(key_col, i, m_bits).alias(f"__bl_pos{i}") for i in range(k)],
    ).select(
        "*",
        *[
            c
            for i in range(k)
            for c in (
                (F.col(f"__bl_pos{i}") / 64).cast("int").alias(f"__bl_widx{i}"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__bl_pos{i} % 64 AS INT))"
                ).alias(f"__bl_mask{i}"),
            )
        ],
    )
    tests = []
    scratch: list[str] = []
    for i in range(k):
        w = f"__bl_widx{i}"
        side = bloom.select(
            F.col("word_idx").alias(w), F.col("word").alias(f"__bl_word{i}")
        )
        out = out.join(F.broadcast(side), w, "left")
        tests.append(
            F.coalesce(F.col(f"__bl_word{i}"), F.lit(0)).bitwiseAND(
                F.col(f"__bl_mask{i}")
            )
            != 0
        )
        scratch += [w, f"__bl_mask{i}", f"__bl_pos{i}", f"__bl_word{i}"]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    # NULL keys hash to NULL positions and the bit tests three-value
    # to NULL — pin the verdict to false so the column is a real
    # boolean for every row
    return out.withColumn(
        "maybe_member", F.coalesce(cond, F.lit(False))
    ).drop(*scratch)


def bloom_pack(bloom: DataFrame, m_bits: int = BLOOM_M_BITS) -> bytes:
    """Densify the sparse (word_idx, word) bitmap into ``m_bits/8``
    BYTES — the packed form :func:`bloom_probe_packed` embeds as a
    single binary plan literal.

    This is a DRIVER-BOUNDED collect by design (the repo's capped-pull
    discipline, like the IVF centroid pulls): the bitmap is at most
    m_bits/64 rows regardless of member count — 512 B at the default
    m=4096, 512 KB at m=2^22.  Guarded at 16 MiB so a mis-sized m can't
    materialize gigabytes on the driver.

    Three alternative shapes were measured and REJECTED at m=2^22
    (DEVNOTES #54): JVM-side densify via map lookup per index (Tungsten
    map access is a linear scan -> O(n_words^2) hang), a broadcast
    cross join carrying the dense array (the 512 KB array is copied
    into EVERY probe row's unsafe row), and an array<bigint> literal
    (pyspark F.lit(list) builds CreateArray with 65536 per-ROW-evaluated
    literal children -> 90 s for 50k probes).  A BINARY literal is one
    scalar: embedded once in the plan, shipped once per executor."""
    n_words = (m_bits + 63) // 64
    if n_words * 8 > (16 << 20):
        raise ValueError(
            f"m_bits={m_bits} would pack {n_words * 8} bytes on the driver; "
            "the packed probe is designed for broadcastable bitmaps "
            "(<= 16 MiB) — use the sparse join-form bloom_probe"
        )
    buf = bytearray(n_words * 8)
    for row in bloom.collect():
        # little-endian within the word so byte index = pos // 8 and
        # bit index = pos % 8 line up across the whole buffer
        w = row["word"] & ((1 << 64) - 1)
        buf[row["word_idx"] * 8 : row["word_idx"] * 8 + 8] = w.to_bytes(8, "little")
    return bytes(buf)


def bloom_probe_packed(
    probe: DataFrame,
    packed: bytes,
    key_col: str = "key",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Zero-shuffle, zero-join Bloom probe: positions are computed
    JVM-side (the oracle-identical md5 polynomial), then the bit tests
    run as ONE vectorized Arrow batch op with the bitmap in the UDF
    closure (a numpy gather + shift per batch — shipped once per
    worker, nanoseconds per row).

    Why not pure JVM expressions: embedding the bitmap as a binary
    plan literal compiles it INTO the whole-stage-codegen source —
    Janino chewed ~50 s on the 512 KB literal before the first row
    moved (and interpreted mode gives that back per-row); the three
    other shapes tried are in DEVNOTES #54.  This is the DEVNOTES #53
    rule again: the moment a constant table is consulted per row at
    probe scale, route the lookup through an Arrow batch.

    The join-form :func:`bloom_probe` remains the mergeable/sparse twin
    and the oracle-attested path; verdict equality is pinned in tests.
    Emits every probe row (duplicates preserved) with maybe_member
    appended; a NULL probe key yields a NULL verdict — the same
    three-valued outcome the sparse twin produces (null positions miss
    the word join and the hit-sum over no non-null rows is null)."""
    from pyspark.sql.functions import pandas_udf

    # NOTE: `pd` must be importable at MODULE scope — with postponed
    # annotation evaluation the `pd.Series` hints are strings pyspark
    # resolves against module globals when building the pandas_udf
    @pandas_udf("boolean")
    def _bit_set(pos: pd.Series) -> pd.Series:
        import numpy as np

        bitmap = np.frombuffer(packed, dtype=np.uint8)
        valid = pos.notna().to_numpy()
        p = pos.fillna(0).to_numpy(dtype=np.int64)
        hit = ((bitmap[p >> 3] >> (p & 7)) & 1).astype(bool)
        out = pd.array(hit, dtype="boolean")
        out[~valid] = pd.NA
        return pd.Series(out)

    out = probe
    for i in range(k):
        out = out.withColumn(f"__bpos_{i}", _position(key_col, i, m_bits))
    cond = F.lit(True)
    for i in range(k):
        # the k UDF calls fuse into one ArrowEvalPython stage
        cond = cond & _bit_set(F.col(f"__bpos_{i}"))
    out = out.withColumn("maybe_member", cond)
    return out.drop(*[f"__bpos_{i}" for i in range(k)])
