"""Dataset-card job (jobs/dataset_card.py): deterministic facts on a
hand frame, end-to-end run over the sf0.001 testdata, markdown/json
artifact shape."""

from __future__ import annotations

import json

from tcdb_spark.jobs.dataset_card import (
    build_dataset_card,
    render_markdown,
    run_dataset_card_job,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta", "en", "s1", 0),
        (2, "alpha beta gamma delta", "en", "s1", 0),   # exact dup of 1
        (3, "uno dos tres", "es", "s2", 0),
        (4, "café bad\x00ctl moji�", "en", "s1", 0),  # NFC+ctl+FFFD
        (5, "   ", "en", "s1", 0),                       # blank: excluded
        (6, None, None, "s2", 0),                        # null: excluded
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_card_facts_hand_frame(spark):
    card = build_dataset_card(_docs(spark), name="hand")
    v = card["volume"]
    assert v["n_docs"] == 4
    assert v["n_tokens"] == 4 + 4 + 3 + 3
    assert v["tokens_min_p50_max"][0] == 3 and v["tokens_min_p50_max"][2] == 4
    langs = {r["lang"]: r["n_docs"] for r in card["languages"]}
    assert langs == {"en": 3, "es": 1}
    d = card["duplication"]
    assert d["n_distinct_texts"] == 3
    assert d["n_exact_dup_docs"] == 1
    assert d["exact_dup_rate_bp"] == 2500  # 1 of 4
    q = card["quality"]
    assert q["n_non_nfc_docs"] == 1 and q["n_mojibake_docs"] == 1
    md = render_markdown(card)
    assert "## Duplication" in md and "exact-duplicate docs: 1" in md


def test_card_job_end_to_end(spark, tmp_path):
    card = run_dataset_card_job(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert card["volume"]["n_docs"] > 0
    assert card["privacy"]["ladder"][0]["level"] == 0
    assert len(card["privacy"]["ladder"]) == 4
    # rungs generalize monotonically: class count never increases
    groups = [r["n_groups"] for r in card["privacy"]["ladder"]]
    assert groups == sorted(groups, reverse=True)
    on_disk = json.load(open(f"{tmp_path}/card.json"))
    assert on_disk == json.loads(json.dumps(card))  # JSON-clean
    md = open(f"{tmp_path}/card.md").read()
    assert md.startswith("# Dataset card — sf0.001")
    # determinism: a second run produces the identical card
    again = run_dataset_card_job(spark, "/root/testdata/sf0.001")
    assert again == card


def test_card_empty_corpus(spark):
    empty = spark.createDataFrame(
        [(1, "   ", "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    card = build_dataset_card(empty, name="empty")
    assert card["volume"]["n_docs"] == 0
    assert card["duplication"]["exact_dup_rate_bp"] == 0
    json.dumps(card)  # JSON-clean
    md = render_markdown(card)
    assert "## Volume" in md and "documents: 0" in md
