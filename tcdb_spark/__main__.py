"""CLI entry points — the engine-side equivalents of the reference's
pipeline commands (tcdb/pipeline/adeck.py:174-273, bdeck.py, master_*.sh
cron wrappers).  Each subcommand composes a deck scan with its batch job
over a versioned warehouse:

    python -m tcdb_spark bdeck  --warehouse /data/wh --input 'decks/b*.dat'
    python -m tcdb_spark adeck  --warehouse /data/wh --input 'decks/a*.dat' --backfill
    python -m tcdb_spark syntrack --warehouse /data/wh --input 'mat/*.mat'
    python -m tcdb_spark maintenance --warehouse /data/wh
    python -m tcdb_spark optimize --warehouse /data/wh --tables observations
    python -m tcdb_spark export --warehouse /data/wh --out /data/export --tables storms

Listing ingestion is engine-native: the ``deckdir`` Python DataSource
(sources/deck_source.py) turns a deck directory into partition-per-file
executor reads (pattern filter at planning time, gzip transparent); an
HTTP fetcher only needs to maintain the landing directory, or swap the
source's listing fn for an index-page fetch. The file-source streaming
twin (streaming/pipeline.py) covers continuous intake, and
``span-dedup`` runs the incremental substring-dedup pipeline the same
cron-batch way.
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def _spark():
    from tcdb_spark.session import get_spark

    return get_spark("tcdb-spark-cli")


def _wh(spark, root: str):
    from tcdb_spark.sources.warehouse import Warehouse

    return Warehouse(spark, root)


def _run_id(prefix: str) -> str:
    return f"{prefix}_{dt.datetime.now(dt.timezone.utc):%Y%m%d%H%M%S}"


def cmd_bdeck(args) -> int:
    from tcdb_spark.jobs.bdeck import run_bdeck_job
    from tcdb_spark.sources.atcf import read_bdeck

    spark = _spark()
    counts = run_bdeck_job(
        spark,
        read_bdeck(spark, args.input),
        _wh(spark, args.warehouse),
        _run_id("CLI_BDECK"),
        bucket_obs=args.bucket_obs,
    )
    print(counts)
    return 0


def cmd_adeck(args) -> int:
    from tcdb_spark.jobs.adeck import run_adeck_job
    from tcdb_spark.sources.atcf import read_adeck

    spark = _spark()
    counts = run_adeck_job(
        spark,
        read_adeck(spark, args.input),
        _wh(spark, args.warehouse),
        _run_id("CLI_ADECK"),
        ref_time=None if args.backfill else dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        backfill=args.backfill,
    )
    print(counts)
    return 0


def cmd_syntrack(args) -> int:
    from pyspark.sql import functions as F

    from tcdb_spark.jobs.syntracks import run_syntrack_job
    from tcdb_spark.operators.windows import latest_per_key
    from tcdb_spark.sources.mat_ensemble import read_mat_ensemble_distributed

    spark = _spark()
    wh = _wh(spark, args.warehouse)
    ensemble = read_mat_ensemble_distributed(spark, args.input)
    # active invests + latest observed position, one per (model, init)
    # in the loaded ensemble (the reference passes invests from the DB
    # into parseSystemTracks; this is its set-based warehouse form)
    storms = wh.read("storms")
    obs = latest_per_key(
        wh.read("observations"), ["storm_id"], ["datetime_utc"]
    ).select("storm_id", "latitude", "longitude", "datetime_utc")
    inv = (
        storms.where((F.col("nhc_number") >= 90) & (F.col("status") == "Active"))
        .join(obs, "storm_id")
        .select(
            F.col("annual_id").cast("int").alias("annual_id"),
            F.col("name"),
            F.col("latitude").alias("lat"),
            F.col("longitude").alias("lon"),
            F.col("datetime_utc").alias("valid"),
        )
    )
    invests = ensemble.select("model", "init").distinct().crossJoin(F.broadcast(inv))
    counts = run_syntrack_job(spark, ensemble, invests, wh, _run_id("CLI_SYNTRACK"))
    print(counts)
    return 0


def cmd_maintenance(args) -> int:
    from tcdb_spark.jobs.maintenance import remove_old_invests, update_active_systems

    spark = _spark()
    wh = _wh(spark, args.warehouse)
    # now defaults to current_timestamp() inside the jobs (Column-typed)
    a = update_active_systems(spark, wh, _run_id("CLI_MAINT"))
    b = remove_old_invests(spark, wh)
    print({"active_updates": a, "invests_removed": b})
    return 0


def cmd_optimize(args) -> int:
    """Table maintenance at the storage layer: fold small files back to
    one per bucket (the lakehouse OPTIMIZE) and apply version retention
    — the periodic job any merge_scoped-ingesting deployment schedules."""
    spark = _spark()
    wh = _wh(spark, args.warehouse)
    out = {}
    for table in args.tables:
        stats = wh.compact(table, target_file_bytes=args.target_file_mb * 1024 * 1024)
        removed = wh.vacuum(table, keep_last=args.keep_versions)
        out[table] = {**stats, "vacuumed_versions": removed}
    print(out)
    return 0


def cmd_cdc(args) -> int:
    """Continuous CDC ingestion: drain change files from a landing dir
    into a warehouse table via the soft-delete apply (out-of-order
    safe, replay-idempotent); see OPERATIONS.md ingest cadence."""
    from pyspark.sql import types as T

    from tcdb_spark.streaming.pipeline import stream_cdc_apply

    spark = _spark()
    wh = _wh(spark, args.warehouse)
    schema = T.StructType.fromJson(__import__("json").load(open(args.schema)))
    q = stream_cdc_apply(
        spark, args.feed, wh, schema, args.table, args.keys,
        seq_col=args.seq_col, op_col=args.op_col,
        checkpoint_dir=args.checkpoint,
    )
    q.awaitTermination()
    print({"table": args.table, "version": wh.current_version(args.table)})
    return 0


def cmd_audit(args) -> int:
    """Corpus-quality audit bundle: run the data-health catalog queries
    (skew, lang-ID confusion, split leakage, robust length outliers,
    per-source quantiles) against a table directory and print one JSON
    report — the pre-training go/no-go checklist as a single command."""
    import json as _json

    from tcdb_spark.plans import QUERIES

    spark = _spark()
    names = [
        "skew_diagnose",
        "lang_id_confusion",
        "split_leakage_check",
        "mad_outlier_filter",
        "approx_quantile_hist",
    ]
    report = {}
    for name in names:
        rows = QUERIES[name](spark, args.sf_dir).collect()
        report[name] = [r.asDict() for r in rows]
    print(_json.dumps(report, default=str))
    return 0


def cmd_dataset_card(args) -> int:
    """Release card for a corpus dir (jobs/dataset_card.py): volume,
    language mix, quality bands, duplication, k-anonymity ladder —
    printed as JSON; ``--out`` also writes card.json + card.md."""
    import json as _json

    from tcdb_spark.jobs.dataset_card import run_dataset_card_job

    card = run_dataset_card_job(_spark(), args.sf_dir, args.out)
    print(_json.dumps(card, sort_keys=True))
    return 0


def cmd_export(args) -> int:
    from tcdb_spark.sources.sinks import export_tables

    spark = _spark()
    counts = export_tables(_wh(spark, args.warehouse), args.out, args.tables, fmt=args.fmt)
    print(counts)
    return 0


def cmd_span_dedup(args) -> int:
    """Continuous substring dedup over a document landing directory:
    file-source stream -> incremental probe of the append-only
    window-hash index -> span log (streaming/pipeline.py
    stream_span_dedup). Run per-batch from cron exactly like the deck
    ingests; AvailableNow drains whatever landed and exits."""
    from tcdb_spark.streaming.pipeline import stream_span_dedup

    spark = _spark()
    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.input)
    )
    q = stream_span_dedup(
        docs,
        index_path=args.index,
        spans_path=args.spans,
        checkpoint=args.checkpoint,
        w=args.window,
    )
    q.awaitTermination()
    n = spark.read.parquet(args.spans).count()
    print({"spans_total": n})
    return 0


def cmd_diff(args) -> int:
    """Row-level diff between two parquet table states: insert/update/
    delete classification (operators/merge.frame_diff) plus a change
    summary — the pre-merge sanity check for vendor re-deliveries and
    staging-vs-production promotion."""
    import json as _json

    from pyspark.sql import functions as F

    from tcdb_spark.operators.merge import frame_diff

    spark = _spark()
    old_df = spark.read.parquet(args.old)
    new_df = spark.read.parquet(args.new)
    d = frame_diff(old_df, new_df, args.keys).persist()
    counts = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    print(_json.dumps({"insert": counts.get("insert", 0),
                       "update": counts.get("update", 0),
                       "delete": counts.get("delete", 0)}))
    if args.out:
        d.write.mode("overwrite").parquet(args.out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tcdb_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--warehouse", required=True, help="versioned warehouse root")

    b = sub.add_parser("bdeck", help="ingest best-track decks")
    common(b)
    b.add_argument("--input", required=True, help="deck file glob (text or .gz)")
    b.add_argument("--bucket-obs", action="store_true", help="bucketed at-scale layout")
    b.set_defaults(fn=cmd_bdeck)

    a = sub.add_parser("adeck", help="ingest forecast decks")
    common(a)
    a.add_argument("--input", required=True)
    a.add_argument("--backfill", action="store_true", help="disable the freshness window")
    a.set_defaults(fn=cmd_adeck)

    s = sub.add_parser("syntrack", help="ingest .mat ensembles")
    common(s)
    s.add_argument("--input", required=True, help="MODEL_YYYYMMDDHH.mat glob")
    s.set_defaults(fn=cmd_syntrack)

    m = sub.add_parser("maintenance", help="archive ended systems, drop stale invests")
    common(m)
    m.set_defaults(fn=cmd_maintenance)

    o = sub.add_parser("optimize", help="compact small files + vacuum old versions")
    common(o)
    o.add_argument("--tables", nargs="+", required=True)
    o.add_argument("--target-file-mb", type=int, default=128)
    o.add_argument("--keep-versions", type=int, default=2)
    o.set_defaults(fn=cmd_optimize)

    sd = sub.add_parser("span-dedup", help="incremental substring dedup over landed documents")
    sd.add_argument("--input", required=True, help="landing dir glob of doc parquet")
    sd.add_argument("--index", required=True, help="append-only window-hash index path")
    sd.add_argument("--spans", required=True, help="duplicated-span log path")
    sd.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    sd.add_argument("--window", type=int, default=10)
    sd.add_argument("--max-files-per-trigger", type=int, default=64)
    sd.set_defaults(fn=cmd_span_dedup)

    c = sub.add_parser("cdc", help="apply a CDC feed directory to a warehouse table")
    common(c)
    c.add_argument("--feed", required=True, help="landing dir of change-file parquet")
    c.add_argument("--table", required=True)
    c.add_argument("--keys", nargs="+", required=True)
    c.add_argument("--schema", required=True, help="feed schema json (StructType.jsonValue)")
    c.add_argument("--seq-col", default="seq")
    c.add_argument("--op-col", default="op")
    c.add_argument("--checkpoint", default=None)
    c.set_defaults(fn=cmd_cdc)

    au = sub.add_parser("audit", help="corpus-quality audit bundle -> one JSON report")
    au.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    au.set_defaults(fn=cmd_audit)

    dc = sub.add_parser(
        "dataset-card",
        help="release card (volume/languages/quality/dup/privacy) -> card.json + card.md",
    )
    dc.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    dc.add_argument("--out", default=None, help="dir for card.json + card.md")
    dc.set_defaults(fn=cmd_dataset_card)

    e = sub.add_parser("export", help="dump warehouse tables for validation")
    common(e)
    e.add_argument("--out", required=True)
    e.add_argument("--tables", nargs="+", required=True)
    e.add_argument("--fmt", default="csv")
    e.set_defaults(fn=cmd_export)

    df = sub.add_parser("diff", help="classify row changes between two parquet states")
    df.add_argument("--old", required=True, help="previous state parquet path")
    df.add_argument("--new", required=True, help="new state parquet path")
    df.add_argument("--keys", nargs="+", required=True)
    df.add_argument("--out", default=None, help="optional parquet path for the change rows")
    df.set_defaults(fn=cmd_diff)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
