"""CLI entry points (python -m tcdb_spark ...): deck file -> warehouse
-> export, end to end through main(), reusing the live test session
(get_spark returns the active session)."""

import glob

from tcdb_spark.__main__ import main

BDECK = [
    "AL, 09, 2022092600, , BEST, 0, 251N, 740W, 35, 1003, TS, 34, NEQ, 60, 40, 30, 50, 1010, 150, 30, 45, 0, L, 8, ab, 270, 8, IAN, D, 12, NEQ, 0, 0, 0, 0, ,",
    "AL, 09, 2022092606, , BEST, 0, 258N, 748W, 45, 996, TS, 34, NEQ, 70, 50, 40, 60, 1009, 160, 25, 55, 0, L, 9, ab, 275, 9, IAN, D, 12, NEQ, 0, 0, 0, 0, ,",
    "EP, 91, 2022092600, , BEST, 0, 151N, 1041W, 25, 1007, DB, 34, NEQ, 0, 0, 0, 0, 1009, 100, 40, 35, 0, E, 5, cd, 280, 6, INVEST, S, 0, , 0, 0, 0, 0, ,",
]


def test_cli_bdeck_maintenance_export(spark, tmp_path):
    from tcdb_spark.sources.warehouse import Warehouse

    deck = tmp_path / "bal092022.dat"
    deck.write_text("\n".join(BDECK) + "\n")
    wh_root = str(tmp_path / "wh")
    out = str(tmp_path / "export")

    assert main(["bdeck", "--warehouse", wh_root, "--input", str(deck)]) == 0
    wh = Warehouse(spark, wh_root)
    assert wh.read("storms").count() == 2
    assert wh.read("observations").count() == 3

    # decks are years old -> maintenance archives both and removes the
    # stale invest (cascade drops its observation)
    assert main(["maintenance", "--warehouse", wh_root]) == 0
    storms = {r["nhc_id"]: r["status"] for r in wh.read("storms").collect()}
    assert storms == {"AL092022": "Archive"}
    assert wh.read("observations").count() == 2

    assert (
        main(["export", "--warehouse", wh_root, "--out", out, "--tables", "storms"]) == 0
    )
    assert glob.glob(f"{out}/storms/part-*")


ADECK_AL09 = [
    "AL, 09, 2022092600, 01, OFCL, 0, 251N, 740W, 35, 1003, TS, 34, NEQ, 60, 40, 30, 50, x",
    "AL, 09, 2022092600, 01, OFCL, 12, 258N, 748W, 45, 998, TS, 34, NEQ, 70, 50, 40, 60, x",
    "AL, 09, 2022092600, 01, OFCL, 24, 265N, 757W, 55, 990, TS, 34, NEQ, 80, 60, 50, 70, x",
    "AL, 09, 2022092600, 02, AVNO, 0, 252N, 741W, 33, 1004, , , , , , , , x",
    "AL, 09, 2022092600, 02, AVNO, 12, 259N, 749W, 44, 999, , , , , , , , x",
    "AL, 09, 2022092600, 03, XTRP, 12, 260N, 750W, 40, 1000, , , , , , , , x",  # not allowlisted
]


def test_cli_full_pipeline_bdeck_adeck_dataset_export(spark, tmp_path):
    """SURVEY §3.1→§3.3 in one sequence, driven entirely through the CLI
    (the engine form of the reference's test.py:23-43 export loop):
    best-track ingest, forecast-deck ingest, the StormDataset-equivalent
    denormalized reads (datasets.py), then a JSON export asserted
    against hand-computed goldens from the fixture decks."""
    import datetime as dt
    import json

    from tcdb_spark.datasets import storm_observations, storm_tracks
    from tcdb_spark.sources.warehouse import Warehouse

    bdeck = tmp_path / "bal092022.dat"
    bdeck.write_text("\n".join(BDECK) + "\n")
    adeck = tmp_path / "aal092022.dat"
    adeck.write_text("\n".join(ADECK_AL09) + "\n")
    wh_root = str(tmp_path / "wh")

    assert main(["bdeck", "--warehouse", wh_root, "--input", str(bdeck)]) == 0
    # decks are historical -> --backfill disables the freshness window
    assert main(["adeck", "--warehouse", wh_root, "--input", str(adeck), "--backfill"]) == 0

    wh = Warehouse(spark, wh_root)

    # StormDataset-equivalent reads (datasets.py twins of
    # tcdb/datasets/storm_dataset.py)
    obs = storm_observations(wh, nhc_id="AL092022")
    assert obs.count() == 2
    # names are stored in the reference's display form (status-prefixed)
    assert {r["name"] for r in obs.select("name").collect()} == {"TS-Ian"}

    trk = storm_tracks(wh, nhc_id="AL092022", models=["OFCL", "AVNO"])
    got = {
        (r["model"], r["hour"], r["intensity_kts"], r["valid_utc"])
        for r in trk.select("model", "hour", "intensity_kts", "valid_utc").collect()
    }
    init = dt.datetime(2022, 9, 26, 0, 0)
    want = {
        ("OFCL", 0, 35.0, init),
        ("OFCL", 12, 45.0, init + dt.timedelta(hours=12)),
        ("OFCL", 24, 55.0, init + dt.timedelta(hours=24)),
        ("AVNO", 0, 33.0, init),
        ("AVNO", 12, 44.0, init + dt.timedelta(hours=12)),
    }
    assert got == want  # XTRP filtered by the model allowlist

    # JSON export (the reference dumps every table to json), golden-checked
    out = tmp_path / "export"
    assert (
        main(
            [
                "export", "--warehouse", wh_root, "--out", str(out),
                "--tables", "storms", "observations", "--fmt", "json",
            ]
        )
        == 0
    )

    def load_json(table):
        recs = []
        for p in glob.glob(f"{out}/{table}/part-*"):
            with open(p) as f:
                recs.extend(json.loads(ln) for ln in f if ln.strip())
        return recs

    storms = load_json("storms")
    assert {(s["nhc_id"], s["name"]) for s in storms} == {
        ("AL092022", "TS-Ian"),
        ("EP912022", "NHC-91E"),
    }
    obs_recs = load_json("observations")
    assert len(obs_recs) == 3
    # ISO-8601 timestamps for stable text round-trips
    assert {o["datetime_utc"] for o in obs_recs} == {
        "2022-09-26T00:00:00",
        "2022-09-26T06:00:00",
    }


def test_cli_parser_rejects_missing_args():
    import pytest

    with pytest.raises(SystemExit):
        main(["bdeck", "--warehouse", "/tmp/x"])  # --input required


def test_cli_optimize_compacts_and_vacuums(spark, tmp_path):
    from pyspark.sql import functions as F

    from tcdb_spark.sources.warehouse import Warehouse

    wh_root = str(tmp_path / "wh")
    wh = Warehouse(spark, wh_root)
    base = spark.range(0, 3_000).select(
        F.col("id").alias("storm_id"), F.lit(1.0).alias("wind")
    )
    wh.write_bucketed("observations", base, ["storm_id"], n_buckets=4)
    for k in (1, 2):
        wh.merge_scoped(
            "observations",
            spark.createDataFrame([(k, 9.0)], "storm_id long, wind double"),
            keys=["storm_id"],
            dedupe_incoming=False,
        )
    assert wh.versions("observations") == [1, 2, 3]

    assert (
        main(
            [
                "optimize", "--warehouse", wh_root,
                "--tables", "observations", "--keep-versions", "1",
            ]
        )
        == 0
    )
    # compacted to v4 (one file per bucket), older versions vacuumed
    assert wh.versions("observations") == [4]
    df = wh.read("observations")
    assert df.count() == 3_000
    assert df.where(F.col("storm_id") == 1).first()["wind"] == 9.0


def test_cli_span_dedup(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(12))
    docs = [(1, "a b " + shared + " c"), (2, "x y z " + shared + " w"),
            (3, " ".join(f"u{i}" for i in range(15)))]
    src = tmp_path / "docs_in"
    src.mkdir()
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    assert (
        main(
            [
                "span-dedup",
                "--input", str(src) + "/*",
                "--index", str(tmp_path / "idx"),
                "--spans", str(tmp_path / "spans"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
        == 0
    )
    spans = spark.read.parquet(str(tmp_path / "spans"))
    assert [r.doc_id for r in spans.collect()] == [2]  # doc 1 owns the passage


def test_cli_cdc_apply(spark, tmp_path):
    import json

    from pyspark.sql import types as T

    from tcdb_spark.__main__ import main
    from tcdb_spark.operators.merge import cdc_view
    from tcdb_spark.sources.warehouse import Warehouse

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    feed = tmp_path / "feed"
    spark.createDataFrame(
        [(1, 1, "I", "a"), (2, 1, "I", "b"), (1, 2, "D", None)], schema
    ).coalesce(1).write.parquet(str(feed))
    sp = tmp_path / "schema.json"
    sp.write_text(json.dumps(schema.jsonValue()))

    rc = main(
        [
            "cdc",
            "--warehouse", str(tmp_path / "wh"),
            "--feed", str(feed),
            "--table", "kv",
            "--keys", "k",
            "--schema", str(sp),
            "--checkpoint", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = {r["k"]: r["v"] for r in cdc_view(wh.read("kv")).collect()}
    assert out == {2: "b"}


def test_cli_audit_bundle(spark, capsys):
    import json

    from tcdb_spark.__main__ import main

    rc = main(["audit", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert set(report) == {
        "skew_diagnose", "lang_id_confusion", "split_leakage_check",
        "mad_outlier_filter", "approx_quantile_hist",
    }
    assert all(len(v) > 0 for v in report.values())


def test_cli_diff_counts_and_rows(spark, tmp_path, capsys):
    import json

    from tcdb_spark.__main__ import main

    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["k", "v"])
    old.write.parquet(str(tmp_path / "old"))
    new.write.parquet(str(tmp_path / "new"))
    rc = main([
        "diff", "--old", str(tmp_path / "old"), "--new", str(tmp_path / "new"),
        "--keys", "k", "--out", str(tmp_path / "changes"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report == {"insert": 1, "update": 1, "delete": 1}
    rows = {
        (r["k"], r["change_type"])
        for r in spark.read.parquet(str(tmp_path / "changes")).collect()
    }
    assert rows == {(2, "update"), (3, "delete"), (4, "insert")}
