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
of the first 4 hex chars, base-131 polynomial, mod m) so a DuckDB
oracle reproduces positions — and therefore the exact maybe-member
verdicts INCLUDING false positives — bit-for-bit.  Everything is
native column expressions: no Python UDFs, no driver-side collect
(the bitmap stays a DataFrame and broadcasts into the probe join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOOM_M_BITS = 4096  # bitmap width (64 longs); power of two not required
BLOOM_K = 3  # hash positions per key


def _position(key: Column, i: int, m_bits: int) -> Column:
    """Deterministic position i in [0, m_bits): base-131 polynomial of
    the ascii values of md5(key || '|' || i)'s first 4 hex chars —
    reproducible in any engine with md5/ascii/substring."""
    h = F.md5(F.concat(key, F.lit(f"|{i}")).cast("binary"))
    poly = F.ascii(F.substring(h, 1, 1))
    for j in (2, 3, 4):
        poly = poly * 131 + F.ascii(F.substring(h, j, 1))
    return poly % m_bits


def position_sql(key_sql: str, i: int, m_bits: int) -> str:
    """The DuckDB-SQL mirror of :func:`_position` (oracle side)."""
    h = f"md5({key_sql} || '|{i}')"
    poly = f"ascii(substr({h}, 1, 1))"
    for j in (2, 3, 4):
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
            F.array(*[_position(F.col(key_col), i, m_bits) for i in range(k)])
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
            F.array(*[_position(F.col(key_col), i, m_bits) for i in range(k)])
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
