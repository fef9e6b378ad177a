"""Scale smoke for the round-8 web-corpus families: HTML extraction,
URL canonicalization, WARC parsing, KMV overlap.

Measurements (local[32], printed as markdown rows for SCALE_SMOKE.md):

1. ``html_extract`` over ~500k composed pages read from parquet —
   rows/s and aggregate HTML MB/s (per-row CPU is the whole cost; the
   rate is what a 100 TB cluster sizing starts from).  The corpus
   carries one PLANTED 8 MB pathological document (a million-element
   flat <div> storm); the per-row byte cap must keep its task bounded
   and the monster must still extract sanely.
2. ``url_normalize`` over the same corpus x 7 messy variants —
   rows/s for the pure-codegen canonicalization path (no Python).
3. WARC compose -> parse round trip at ~20k files (25 records each,
   half per-record-gzip) — parse-side MB/s over the archive bytes.
4. ``kmv_overlap`` at 2M keys / 20 groups, PRUNED k=4096 vs the exact
   answer — wall time and worst relative error across all pair
   intersections (stderr ~ 1/sqrt(k) = 1.6%).

Usage: python tools/scale_smoke_web.py [n_docs] [n_kmv_keys]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs_replicated(spark, n_docs: int):
    from pyspark.sql import functions as F

    from tcdb_spark.plans.catalog import load_tables

    d = load_tables(spark, SF_DIR, "documents")["documents"].where(
        F.length(F.trim("text")) > 0
    )
    base = d.count()
    reps = max(1, n_docs // base)
    return (
        d.select(
            "doc_id",
            "source",
            "text",
            F.explode(F.sequence(F.lit(1), F.lit(reps))).alias("rep"),
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "source",
            "text",
        )
        .repartition(64)
    )


def html_smoke(spark, n_docs: int) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from tcdb_spark.plans.queries_web import _HTML_TMPL, _compose_spark
    from tcdb_spark.sources.web import html_extract

    d = _docs_replicated(spark, n_docs)
    monster = spark.createDataFrame(
        [(999_999_999_999, "srcX", "x")], "doc_id long, source string, text string"
    ).select(
        "doc_id",
        F.concat(
            F.lit("<div>deep</div>" * 550_000), F.lit("<p>needle</p>")
        ).alias("html"),
    )
    pages = d.select("doc_id", _compose_spark(_HTML_TMPL).alias("html")).unionAll(
        monster
    )
    tmp = tempfile.mkdtemp(prefix="web_smoke_")
    pages.write.mode("overwrite").parquet(tmp)
    src = spark.read.parquet(tmp)
    n = src.count()
    mb = (
        src.select(F.sum(F.octet_length("html")).alias("b")).collect()[0].b / 1e6
    )
    t0 = time.time()
    out = html_extract(src, max_html_bytes=1 << 20)
    agg = out.select(
        F.count("*").alias("n"),
        F.sum("text_chars").alias("chars"),
        F.max("html_chars").alias("max_html"),
    ).collect()[0]
    dt = time.time() - t0
    monster_row = html_extract(
        src.where(F.col("doc_id") == 999_999_999_999), max_html_bytes=1 << 20
    ).collect()[0]
    assert "deep" in monster_row.body and monster_row.html_chars == 1 << 20
    print(
        f"| html_extract: {n} pages ({mb:.0f} MB) from parquet | "
        f"{dt:.1f} s = {n / dt:,.0f} pages/s, {mb / dt:.0f} MB/s; planted 8 MB "
        f"monster capped at 1 MiB and still extracted ({agg.max_html} max chars seen) |"
    )
    return tmp


def url_smoke(spark, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.queries_web import _variants_spark
    from tcdb_spark.sources.web import url_normalize

    d = _docs_replicated(spark, n_docs)
    urls = d.select(F.explode(_variants_spark()).alias("url"))
    t0 = time.time()
    got = urls.select(url_normalize("url").alias("c")).select(
        F.count("*").alias("n"), F.countDistinct("c").alias("d")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"| url_normalize: {got.n:,} messy URLs -> {got.d:,} canonicals | "
        f"{dt:.1f} s = {got.n / dt:,.0f} URLs/s (pure codegen, no Python) |"
    )


def warc_smoke(spark, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.plans.queries_web import warc_roundtrip_extract

    # reuse the lane body against a replicated doc frame by monkey-free
    # recomposition: group 25/file as the lane does
    from tcdb_spark.sources import warc as W_

    d = _docs_replicated(spark, n_docs).select(
        "doc_id",
        (F.col("doc_id") % 20_000).alias("file_id"),
        F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")).alias(
            "html"
        ),
    )

    def _compose(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        recs = [
            {
                "warc_type": "response",
                "record_id": f"<urn:doc:{did}>",
                "date": "2026-01-01T00:00:00Z",
                "target_uri": f"https://crawl.example.com/doc/{did}",
                "payload": W_.build_http_response(html.encode("utf-8")),
            }
            for did, html in zip(pdf["doc_id"], pdf["html"])
        ]
        return pd.DataFrame(
            {"fname": [f"part-{fid}.warc"], "data": [W_.build_warc(recs, gzip_members=(fid % 2 == 0))]}
        )

    files = d.groupBy("file_id").applyInPandas(
        _compose, schema="fname string, data binary"
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="warc_smoke_")
    files.write.mode("overwrite").parquet(tmp)
    src = spark.read.parquet(tmp)
    stats = src.select(
        F.count("*").alias("files"), F.sum(F.octet_length("data")).alias("b")
    ).collect()[0]
    t0 = time.time()
    recs = W_.records_frame(src, "fname", "data")
    got = recs.select(
        F.count("*").alias("n"), F.sum(F.octet_length("body")).alias("body_b")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"| warc parse: {stats.files:,} archives ({stats.b / 1e6:.0f} MB, half .warc.gz) "
        f"-> {got.n:,} records | {dt:.1f} s = {stats.b / 1e6 / dt:.0f} MB/s archive bytes |"
    )


def kmv_smoke(spark, n_keys: int) -> None:
    from pyspark.sql import functions as F

    from tcdb_spark.operators.sketch import kmv_overlap, kmv_sketch

    # 20 groups; group g holds keys [g*step, g*step + width) — known
    # pairwise overlaps shrink linearly with group distance
    width = n_keys // 20
    step = width // 2
    rows = spark.range(n_keys * 2).select(
        (F.col("id") % 20).cast("string").alias("g"),
        F.concat(
            F.lit("k"),
            ((F.col("id") % 20) * step + F.xxhash64("id") % width).cast("string"),
        ).alias("key"),
    )
    t0 = time.time()
    sk = kmv_sketch(rows, "g", "key", k=4096)
    got = {(r.group_a, r.group_b): r for r in kmv_overlap(sk, "g").collect()}
    dt = time.time() - t0
    exact = {
        (r.ga, r.gb): r.ni
        for r in rows.dropDuplicates(["g", "key"])
        .alias("a")
        .join(
            rows.dropDuplicates(["g", "key"]).alias("b"),
            (F.col("a.key") == F.col("b.key")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(F.count("*").alias("ni"))
        .collect()
    }
    errs = [
        abs(got[p].est_intersection - exact[p]) / exact[p]
        for p in exact
        if exact[p] >= 1000 and p in got
    ]
    dropped = sum(1 for p in exact if p not in got and exact[p] >= 1000)
    print(
        f"| kmv_overlap: {n_keys * 2:,} rows, 20 groups, pruned k=4096 | "
        f"{dt:.1f} s; worst rel error on intersections >=1000: "
        f"{max(errs) * 100:.1f}% over {len(errs)} pairs ({dropped} large pairs missed) |"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from tcdb_spark.session import get_spark

    spark = get_spark("scale-smoke-web", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    print(f"| operator | result |  (n_docs={n_docs}, n_keys={n_keys})")
    print("|---|---|")
    html_smoke(spark, n_docs)
    url_smoke(spark, n_docs)
    warc_smoke(spark, n_docs)
    kmv_smoke(spark, n_keys)


if __name__ == "__main__":
    main()
