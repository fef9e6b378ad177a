"""BPE scale smoke: prove the 'corpus-sized once, vocab-sized per merge'
claim — learn merges over a corpus replicated far beyond the test SFs
and report the word-count pass vs per-merge iteration cost separately.

Usage: python tools/scale_smoke_bpe.py [replication]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from tcdb_spark.operators.bpe import _apply_merge, _pair_counts, words_with_counts
    from tcdb_spark.session import get_spark

    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("scale-smoke-bpe")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs.crossJoin(spark.range(rep).select(F.col("id").alias("__rep")))
    n_docs = big.count()

    t0 = time.perf_counter()
    vocab = (
        words_with_counts(big)
        .withColumn("symbols", F.split(F.col("word"), ""))
        .select("symbols", "cnt")
        .persist()
    )
    n_vocab = vocab.count()
    t_corpus = time.perf_counter() - t0

    n_merges, t_iter = 8, 0.0
    for i in range(n_merges):
        t0 = time.perf_counter()
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )[0]
        old = vocab
        vocab = _apply_merge(vocab, top["l"], top["r"]).persist()
        vocab.count()
        old.unpersist()
        t_iter += time.perf_counter() - t0

    print(
        f"docs={n_docs:,} vocab={n_vocab:,} corpus_pass={t_corpus:.1f}s "
        f"merges={n_merges} iter_total={t_iter:.1f}s iter_avg={t_iter/n_merges:.2f}s",
        flush=True,
    )

    # realistic-vocab case: 1M distinct words (hex md5 prefixes, 16-symbol
    # alphabet) — the per-merge cost at a real tokenizer-training vocab
    vocab = (
        spark.range(1_000_000)
        .select(
            F.split(F.substring(F.md5(F.col("id").cast("string").cast("binary")), 1, 8), "").alias(
                "symbols"
            ),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("cnt"),
        )
        .persist()
    )
    n_vocab = vocab.count()
    t_iter = 0.0
    for i in range(n_merges):
        t0 = time.perf_counter()
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )[0]
        old = vocab
        vocab = _apply_merge(vocab, top["l"], top["r"]).persist()
        vocab.count()
        old.unpersist()
        t_iter += time.perf_counter() - t0
    print(
        f"synthetic vocab={n_vocab:,} merges={n_merges} "
        f"iter_total={t_iter:.1f}s iter_avg={t_iter/n_merges:.2f}s",
        flush=True,
    )

    # encode path: the vocab-table segmentation + broadcast-join encode
    # (bpe_encode) vs the direct per-occurrence fold (bpe_segment) on the
    # same replicated corpus — the measured gap that justifies routing
    # corpus tokenization through the distinct-word table
    from tcdb_spark.operators.bpe import bpe_encode, bpe_learn, bpe_segment

    docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    merges = bpe_learn(spark, docs01, n_merges=16)
    big_docs = (
        docs01.crossJoin(spark.range(rep // 10 or 1).select(F.col("id").alias("__rep")))
        .select(
            (F.col("doc_id") * (rep // 10 or 1) + F.col("__rep")).alias("doc_id"),
            "text",
        )
    )
    n_docs = big_docs.count()

    t0 = time.perf_counter()
    n_tok = bpe_encode(big_docs, merges).select(F.sum(F.size("tokens"))).collect()[0][0]
    t_vocab_path = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_tok2 = (
        bpe_segment(big_docs, merges).select(F.sum(F.size("tokens"))).collect()[0][0]
    )
    t_fold_path = time.perf_counter() - t0
    assert n_tok == n_tok2, (n_tok, n_tok2)
    print(
        f"encode docs={n_docs:,} tokens={n_tok:,} "
        f"vocab_path={t_vocab_path:.1f}s fold_path={t_fold_path:.1f}s "
        f"speedup={t_fold_path / t_vocab_path:.1f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
