"""Streaming crawl frontier (streaming/pipeline.stream_link_frontier):
discovery, crawled/queued state machine, replay fixed point."""

from __future__ import annotations

import json

from tcdb_spark.sources.warehouse import Warehouse
from tcdb_spark.streaming.pipeline import stream_link_frontier


def _page(url: str, outlinks: list[str], ts: str) -> dict:
    body = "".join(f'<p><a href="{u}">x</a></p>' for u in outlinks)
    return {"url": url, "html": f"<html><body>{body}</body></html>", "ts": ts}


def test_frontier_two_ticks_and_replay(spark, tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def tick(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        q = stream_link_frontier(
            spark, str(src), wh, checkpoint_dir=str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    A = "https://www.a.example:443/"  # canonicalizes to https://a.example/
    B = "https://b.example/p?utm_source=x"  # -> https://b.example/p
    C = "https://c.example/q"
    D = "https://d.example/"
    E = "https://e.example/"

    tick(
        "t1.json",
        [
            _page(A, [B, C, "/relative/skipped"], "2026-01-01T10:00:00"),
            _page(B, [C, D], "2026-01-01T10:00:00"),
        ],
    )
    t1 = {r.canonical_url: r for r in wh.read("crawl_frontier").collect()}
    assert t1["https://a.example/"].status == "crawled"
    assert t1["https://b.example/p"].status == "crawled"
    # B's messy variant was both crawled and discovered as an outlink:
    # crawled wins within the same batch
    assert t1["https://c.example/q"].status == "queued"
    assert t1["https://d.example/"].status == "queued"
    assert len(t1) == 4  # the relative link never enqueued
    assert t1["https://c.example/q"].host == "c.example"

    # tick 2: C gets crawled, links back to already-crawled A and to new E
    tick("t2.json", [_page(C, [A, E], "2026-01-01T11:00:00")])
    t2 = {r.canonical_url: r for r in wh.read("crawl_frontier").collect()}
    assert t2["https://c.example/q"].status == "crawled"  # queued -> crawled
    assert t2["https://a.example/"].status == "crawled"  # NOT demoted
    assert t2["https://e.example/"].status == "queued"
    assert t2["https://d.example/"].status == "queued"  # untouched
    assert len(t2) == 5

    # replay fixed point: wipe the checkpoint, re-drop tick 2's file
    # content as a new file — the table must not change
    import shutil

    shutil.rmtree(tmp_path / "ckpt")
    tick("t2-redelivered.json", [_page(C, [A, E], "2026-01-01T11:00:00")])
    t3 = {r.canonical_url: r for r in wh.read("crawl_frontier").collect()}
    assert {u: (r.status, r.discovered_ts) for u, r in t3.items()} == {
        u: (r.status, r.discovered_ts) for u, r in t2.items()
    }
