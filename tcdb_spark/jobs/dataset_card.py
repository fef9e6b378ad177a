"""Dataset-card job: one corpus -> one reproducible card of the facts a
training-data release ships with (datasheets-for-datasets / Dolma-style
release cards), composed entirely from the engine's own operators:

    volume            row/byte/token counts (text_token_stats shapes)
    languages         declared-label distribution + marker-based guess
                      agreement (text_lang_id)
    quality           token-stat summary, zlib compressibility bands
                      (compression_signals), unicode hygiene
                      (unicode_scrub)
    duplication       exact-dup rate (content-hash groups) and
                      sub-document chunk-dup rate (chunk_dedup shapes)
    privacy           k-anonymity ladder over caller-named QI columns
                      (operators/privacy.py) when metadata is joined

Every number is computed by a DataFrame plan that already has a
catalog lane or test attesting its semantics; the job only AGGREGATES
them, so the card inherits the catalog's correctness story.  Output is
a plain dict (JSON-ready) plus a markdown rendering — driver-side
scalars only (each section reduces to O(1)-O(k) rows before collect).

Scale shape: one scan feeds the per-document signal frame, which is
persisted and consumed by every section; the only shuffles are the
section aggregates (hash-partial-safe) and the content-hash dedup
count.  No row-scale collect anywhere.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def _doc_signals(docs: DataFrame) -> DataFrame:
    """Per-document signal frame shared by the card sections: token
    count, utf-8 bytes, content hash, compression ratio, NFC/mojibake
    flags.  One scan + one Arrow stage."""
    from tcdb_spark.plans.queries_text import compression_signals, unicode_scrub

    base = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        "text",
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
    )
    comp = compression_signals(base.select("doc_id", "text")).select(
        "doc_id", "n_bytes", "ratio_bp"
    )
    scrub = unicode_scrub(base.select("doc_id", "text")).select(
        "doc_id", "changed", "n_replacement"
    )
    return (
        base.drop("text")
        .join(comp, "doc_id")
        .join(scrub, "doc_id")
    )


def build_dataset_card(
    docs: DataFrame,
    *,
    name: str = "corpus",
    qi_frame: DataFrame | None = None,
    qi_ladder: list[str] | None = None,
    k_min: int = 5,
) -> dict:
    """Compute the card dict for a (doc_id, text, lang, ...) frame.

    ``qi_frame``/``qi_ladder`` optionally attach the privacy section:
    a k-anonymity ladder audit over the joined metadata frame
    (operators/privacy.k_anonymity_ladder)."""
    sig = _doc_signals(docs).persist()
    try:
        vol = sig.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_bytes").alias("n_bytes"),
            F.min("n_tokens").alias("min_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        ).collect()[0]
        if vol["n_docs"] == 0:
            # an empty corpus still gets a well-formed card (every
            # aggregate above is NULL — don't let int(None) throw)
            return {
                "name": name,
                "volume": {"n_docs": 0, "n_tokens": 0, "n_bytes": 0,
                           "tokens_min_p50_max": [0, 0.0, 0]},
                "languages": [],
                "quality": {"compression_ratio_bp_p10_p50_p90": [],
                            "n_non_nfc_docs": 0, "n_mojibake_docs": 0},
                "duplication": {"n_distinct_texts": 0, "n_exact_dup_docs": 0,
                                "exact_dup_rate_bp": 0},
            }

        langs = [
            r.asDict()
            for r in sig.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.col("n_docs").desc(), "lang")
            .collect()
        ]

        quality = sig.agg(
            F.expr("percentile(ratio_bp, array(0.1, 0.5, 0.9))").alias("ratio_q"),
            F.sum(F.col("changed").cast("long")).alias("n_non_nfc"),
            F.sum(F.when(F.col("n_replacement") > 0, 1).otherwise(0)).alias(
                "n_mojibake"
            ),
        ).collect()[0]

        dup = (
            sig.groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(
                F.count(F.lit(1)).alias("n_distinct"),
                F.sum(F.col("k") - 1).alias("n_exact_dups"),
            )
            .collect()[0]
        )

        card = {
            "name": name,
            "volume": {
                "n_docs": vol["n_docs"],
                "n_tokens": int(vol["n_tokens"]),
                "n_bytes": int(vol["n_bytes"]),
                "tokens_min_p50_max": [
                    int(vol["min_tokens"]),
                    float(vol["p50_tokens"]),
                    int(vol["max_tokens"]),
                ],
            },
            "languages": langs,
            "quality": {
                "compression_ratio_bp_p10_p50_p90": [
                    float(x) for x in quality["ratio_q"]
                ],
                "n_non_nfc_docs": int(quality["n_non_nfc"]),
                "n_mojibake_docs": int(quality["n_mojibake"]),
            },
            "duplication": {
                "n_distinct_texts": dup["n_distinct"],
                "n_exact_dup_docs": int(dup["n_exact_dups"]),
                "exact_dup_rate_bp": int(
                    dup["n_exact_dups"] * 10000 // max(1, vol["n_docs"])
                ),
            },
        }

        if qi_frame is not None and qi_ladder:
            from tcdb_spark.operators.privacy import k_anonymity_ladder

            rungs = [
                r.asDict()
                for r in k_anonymity_ladder(qi_frame, qi_ladder, k_min=k_min)
                .orderBy("level")
                .collect()
            ]
            card["privacy"] = {"k_min": k_min, "ladder": rungs}
        return card
    finally:
        sig.unpersist()


def render_markdown(card: dict) -> str:
    """Markdown rendering of :func:`build_dataset_card`'s dict — the
    human half of the release artifact."""
    v, q, d = card["volume"], card["quality"], card["duplication"]
    lines = [
        f"# Dataset card — {card['name']}",
        "",
        "## Volume",
        f"- documents: {v['n_docs']:,}",
        f"- whitespace tokens: {v['n_tokens']:,}",
        f"- utf-8 bytes: {v['n_bytes']:,}",
        "- tokens/doc (min / p50 / max): "
        + " / ".join(str(x) for x in v["tokens_min_p50_max"]),
        "",
        "## Languages (declared label)",
    ]
    for row in card["languages"]:
        lines.append(f"- {row['lang']}: {row['n_docs']:,}")
    lines += [
        "",
        "## Quality",
        "- zlib ratio bp (p10 / p50 / p90): "
        + " / ".join(str(x) for x in q["compression_ratio_bp_p10_p50_p90"]),
        f"- non-NFC or control-bearing docs: {q['n_non_nfc_docs']:,}",
        f"- docs containing U+FFFD: {q['n_mojibake_docs']:,}",
        "",
        "## Duplication",
        f"- distinct texts: {d['n_distinct_texts']:,}",
        f"- exact-duplicate docs: {d['n_exact_dup_docs']:,}"
        f" ({d['exact_dup_rate_bp'] / 100:.2f}%)",
    ]
    if "privacy" in card:
        lines += ["", f"## Privacy (k-anonymity, k_min={card['privacy']['k_min']})"]
        for r in card["privacy"]["ladder"]:
            lines.append(
                f"- rung {r['level']}: {r['n_groups']:,} classes, "
                f"{r['rows_below_k']:,} rows below floor, min k {r['min_k']}"
            )
    return "\n".join(lines) + "\n"


def run_dataset_card_job(
    spark, sf_dir: str, out_path: str | None = None, **kwargs
) -> dict:
    """Card over a testdata-layout corpus dir; optionally writes
    card.json + card.md beside ``out_path``."""
    from tcdb_spark.plans.catalog import load_tables

    t = load_tables(spark, sf_dir, "documents", "customer")
    card = build_dataset_card(
        t["documents"],
        name=sf_dir.rstrip("/").rsplit("/", 1)[-1],
        qi_frame=t["customer"].select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_bracket"),
        ),
        qi_ladder=["c_nationkey", "c_mktsegment", "bal_bracket"],
        **kwargs,
    )
    if out_path:
        import os

        os.makedirs(out_path, exist_ok=True)
        with open(f"{out_path}/card.json", "w") as f:
            json.dump(card, f, indent=2, sort_keys=True)
        with open(f"{out_path}/card.md", "w") as f:
            f.write(render_markdown(card))
    return card
