"""Distributed BPE learning vs the pure-Python published algorithm."""

from __future__ import annotations

from tcdb_spark.operators.bpe import (
    bpe_learn,
    bpe_learn_reference,
    bpe_segment,
)


def _texts(spark, sf="/root/testdata/sf0.001"):
    rows = spark.read.parquet(f"{sf}/documents.parquet").select("text").collect()
    return [r.text for r in rows]


def test_bpe_learn_matches_reference(spark):
    texts = _texts(spark)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_learn(spark, docs, n_merges=12)
    want = bpe_learn_reference(texts, n_merges=12)
    assert got == want
    assert len(got) == 12  # corpus is big enough to yield all 12


def test_bpe_learn_deterministic_under_partitioning(spark):
    texts = _texts(spark)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    a = bpe_learn(spark, docs.repartition(1), n_merges=6)
    b = bpe_learn(spark, docs.repartition(13), n_merges=6)
    assert a == b


def test_bpe_segment_roundtrip(spark):
    docs = spark.createDataFrame(
        [("low lower lowest low",), ("newer newest new",)], "text string"
    )
    merges = bpe_learn(spark, docs, n_merges=5)
    seg = bpe_segment(docs, merges).select("text", "tokens").collect()
    for r in seg:
        # concatenating tokens reproduces the normalized text sans spaces
        assert "".join(r.tokens) == r.text.lower().replace(" ", "")
        # at least one multi-char token exists once merges applied
    assert any(len(t) > 1 for r in seg for t in r.tokens)


def test_bpe_encode_matches_reference_and_segment(spark):
    """The vocab-path encode (distinct-word fold + broadcast join) must
    equal BOTH the pure-Python published algorithm and the direct
    corpus-sized fold (bpe_segment) — token-for-token, in doc order."""
    from tcdb_spark.operators.bpe import bpe_encode, bpe_encode_reference

    texts = _texts(spark)[:50]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = bpe_learn(spark, docs, n_merges=8)

    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    want = bpe_encode_reference(texts, merges)
    for i, t in enumerate(texts):
        if t.strip():
            assert got[i] == want[i], f"doc {i} diverges from reference"

    seg = {
        r.doc_id: list(r.tokens)
        for r in bpe_segment(docs, merges).select("doc_id", "tokens").collect()
        if r.doc_id in got
    }
    assert got == seg


def test_bpe_encode_partitioning_independent(spark):
    from tcdb_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "newer newest new"), (3, "low new")],
        "doc_id int, text string",
    )
    merges = bpe_learn(spark, docs, n_merges=4)
    a = {r.doc_id: list(r.tokens) for r in bpe_encode(docs.repartition(1), merges).collect()}
    b = {r.doc_id: list(r.tokens) for r in bpe_encode(docs.repartition(7), merges).collect()}
    assert a == b
