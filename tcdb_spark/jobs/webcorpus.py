"""Web-corpus intake job: WARC archives -> curated text in the warehouse.

The end-to-end batch a pretraining-data team runs per crawl segment
drop, composed entirely from the engine's own operators:

    read_warc(path)                      file-granular archive scan
      -> keep response/200/text-html     native filters, pre-extraction
      -> html_extract                    title/body/structure (Arrow)
      -> url_canonicalize                codegen normalization
      -> keep-best per canonical URL     the cheapest dedup first
      -> quality gates                   min chars / link spam / boiler
      -> exact content dedup             md5 body hash
      -> MERGE into warehouse 'webdocs'  idempotent on content hash

Idempotence: the MERGE keys on the content hash, so re-running a
segment (retry, backfill, duplicate drop) is a fixed point — the same
contract as jobs/bdeck.py.  Each stage is shuffle-accounted in its
docstring; the only wide exchanges are the canonical-URL window and
the content-hash MERGE, both on their natural keys.

Reference-anchor: the batch-job composition pattern of
``tcdb/pipeline/master_bdeck.sh`` + ``tcdb/etl/process_obs.py``
(orchestrated incremental upserts), applied to the web modality the
reference does not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.sources.warehouse import Warehouse


def curate_pages(
    records: DataFrame,
    min_chars: int = 200,
    max_link_density_bp: int = 5000,
) -> DataFrame:
    """WARC record rows -> one curated-candidate row per page.

    Gates (each attributable as a boolean before the final AND, the
    quality_gopher_rules discipline): HTTP 200 + text/html only, body
    at least ``min_chars`` extracted characters, page-level link
    density (total anchor chars / body chars, basis points) at most
    ``max_link_density_bp`` — link farms score ~10000."""
    from tcdb_spark.sources.web import html_blocks, url_normalize

    pages = records.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
        & F.col("target_uri").isNotNull()
    ).select(
        # deterministic record identity (NOT monotonically_increasing_id,
        # which is partition-layout-dependent and differs between the two
        # plan branches below under task retry)
        F.xxhash64("warc_file", "record_id", "target_uri").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("body").cast("string").alias("html"),
    )
    blocks = html_blocks(pages, id_col="doc_id", html_col="html")
    # html_blocks prunes to (doc_id, html); re-attach url by doc_id
    meta = pages.select(
        "doc_id", "url", url_normalize("url").alias("canonical_url")
    )
    body = blocks.where(~F.col("in_boiler")).groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "text"))),
                lambda x: x["text"],
            ),
            "\n",
        ).alias("body"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum("link_chars").alias("n_link_chars"),
        F.sum("n_links").alias("n_links"),
    )
    # left join: an all-boilerplate page still appears as a candidate
    # (n_chars 0) and is dropped ATTRIBUTABLY by the length gate
    cand = meta.join(body, "doc_id", "left").na.fill(
        {"body": "", "n_chars": 0, "n_link_chars": 0, "n_links": 0}
    )
    link_bp = F.when(
        F.col("n_chars") > 0, (F.lit(10000) * F.col("n_link_chars")) / F.col("n_chars")
    ).otherwise(F.lit(10000))
    return cand.select(
        "url",
        "canonical_url",
        "body",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_links").cast("long").alias("n_links"),
        (F.col("n_chars") >= min_chars).alias("long_enough"),
        (link_bp <= max_link_density_bp).alias("not_link_spam"),
    )


def run_webcorpus_job(
    spark: SparkSession,
    warc_path: str,
    warehouse: Warehouse,
    min_chars: int = 200,
) -> dict:
    """Full segment intake; returns stage counts for the run report."""
    from tcdb_spark.operators.merge import merge
    from tcdb_spark.sources.warc import read_warc

    records = read_warc(spark, warc_path)
    cand = curate_pages(records, min_chars=min_chars).cache()
    n_pages = cand.count()

    kept = cand.where(F.col("long_enough") & F.col("not_link_spam"))
    # URL-level keep-best: longest body per canonical URL, smallest url
    # string as the deterministic tiebreak (task-retry stable)
    w = W.partitionBy("canonical_url").orderBy(
        F.col("n_chars").desc(), F.col("url")
    )
    best = (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "long_enough", "not_link_spam")
    )
    # exact content dedup + idempotent MERGE on the content hash
    docs = best.withColumn("content_hash", F.md5(F.col("body").cast("binary")))
    cur = warehouse.read("webdocs", schema=docs.schema)
    merged = merge(cur, docs, keys=["content_hash"], dedupe_incoming=True)
    warehouse.write("webdocs", merged)
    n_final = warehouse.read("webdocs").count()
    out = {
        "pages": n_pages,
        "kept_after_gates": kept.count(),
        "kept_after_url_dedup": best.count(),
        "table_rows": n_final,
    }
    cand.unpersist()
    return out
