"""Scale smoke for the span-dedup and sketch shapes: synthetic corpus
generated with spark.range (no disk), sized so the exploded window /
token row counts reach the 10^8 order on local[32].

- duplicated_spans over N_DOCS docs x ~DOC_LEN tokens (1% of docs carry
  a shared 30-token passage at a doc-dependent offset): checks the
  span count matches the planted expectation and times the two-shuffle
  plan at ~N_DOCS*DOC_LEN exploded window rows.
- heavy_hitters_exact over N_TOK tokens (100 planted hot tokens at 20%
  mass, the rest near-unique): checks exactly the 100 planted hitters
  return, times the sketch pass + broadcast recount.

Usage: python tools/scale_smoke_spans.py [n_docs] [n_tokens]
Appends nothing; prints a markdown table row set for SCALE_SMOKE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from tcdb_spark.operators.sketch import heavy_hitters_exact
    from tcdb_spark.operators.spans import duplicated_spans
    from tcdb_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_tok = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    spark = get_spark("scale-smoke-spans")

    # --- duplicated spans -------------------------------------------------
    doc_len = 100
    shared = F.array(*[F.lit(f"shared{i}") for i in range(30)])
    uniq = F.transform(
        F.sequence(F.lit(1), F.lit(doc_len - 30)),
        lambda j: F.concat(F.lit("t"), F.col("id"), F.lit("_"), j),
    )
    is_dup = F.col("id") % 100 < 1  # 1% of docs share the passage
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            is_dup,
            F.concat(
                F.slice(uniq, 1, (F.col("id") % 40).cast("int") + 1),
                shared,
                F.slice(uniq, (F.col("id") % 40).cast("int") + 2, doc_len),
            ),
        )
        .otherwise(uniq)
        .alias("tokens"),
    )
    t0 = time.perf_counter()
    spans = duplicated_spans(docs, w=10)
    n_spans = spans.count()
    t_spans = round(time.perf_counter() - t0, 1)
    exp = n_docs // 100 - 1  # every dup doc except the min-id owner
    print(f"| duplicated_spans | {n_docs:,} docs x {doc_len} tokens "
          f"(~{n_docs * (doc_len - 9):,} windows) | {t_spans}s | "
          f"{n_spans} spans (expected {exp}) |")
    assert n_spans == exp, (n_spans, exp)

    # --- heavy hitters ----------------------------------------------------
    hot = (F.col("id") % 5 == 0)  # 20% of mass over 100 hot tokens
    toks = spark.range(n_tok).select(
        F.when(hot, F.concat(F.lit("hot"), F.floor(F.col("id") / 5) % 100))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("token")
    )
    t0 = time.perf_counter()
    out = heavy_hitters_exact(toks, "token", k=1000)
    hits = out.count()
    t_hh = round(time.perf_counter() - t0, 1)
    print(f"| heavy_hitters_exact | {n_tok:,} tokens, ~{n_tok * 4 // 5:,} "
          f"distinct | {t_hh}s | {hits} hitters (expected 100) |")
    assert hits == 100, hits


if __name__ == "__main__":
    main()
