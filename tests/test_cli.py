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
