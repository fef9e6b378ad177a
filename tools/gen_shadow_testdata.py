"""Generate SHADOW testdata — same schema/domains as the driver's
seed-42 tables (TESTDATA.md), different seed, plus planted adversarial
structure — and never touching /root/testdata.

Why this exists (round-8 verdict #2): all 218+ oracles had only ever
run against one fixed dataset, so a plan could silently depend on a
distributional accident of seed 42 (no duplicate natural keys, no
equal-timestamp as-of ties, no empty groups, benign skew, no nulls).
Running ``tools/check_oracle.py <shadow_dir>`` re-attests every lane on
data those accidents don't hold for; any hash mismatch is either a
latent order/tie-break bug or an engine-divergence the seed had been
hiding.

Planted nasties (all in-schema — types and value domains match the
driver's generator; results are recorded in ORACLE_SHADOW.md):

- duplicate natural keys: 20 duplicated event_ids, 5 duplicated
  (l_orderkey, l_linenumber) pairs
- equal-timestamp ties: 50 events of one user at ONE exact ts, 30% of
  event timestamps snapped to hour boundaries (as-of/window ties)
- empty groups: a nation with no customers, a customer with no orders,
  no 'de' documents, no 'src13' source, no label-9 embeddings,
  'signup' events at 0.5%
- skew: user 0 holds ~10% of events, one order carries 400 lineitems
- nulls: ~1% null events.value plus one user ALL-null, ~0.5% null props
- text degeneracy: two exact-duplicate text groups, a one-word-edit
  near-dup, a containment pair, an empty text, a whitespace-only text,
  a single-word text, a 50x-length outlier
- vector degeneracy: two bit-identical embeddings under different ids
  (deterministic-tie-break probe) and a 1e-7-perturbed near-tie
- events.ts is written as parquet TIMESTAMP(NANOS) — the physical type
  the driver shipped in earlier rounds — exercising load_tables'
  nanosAsLong truncation path against DuckDB's TIMESTAMP_NS read

Usage:
    python tools/gen_shadow_testdata.py [--out shadow_testdata/sf0.01]
                                        [--sf 0.01] [--seed 1337]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJECTIVES = ["small", "big", "red", "blue", "green", "slow", "fast", "shiny"]
NOUNS = ["widget", "bolt", "ring", "gear", "valve", "plate", "wheel", "spring"]
EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "es", "fr", "zh"]  # 'de' deliberately absent (empty group)

DAY_US = 86_400_000_000


def _ts_us(iso_day: str) -> int:
    return int(np.datetime64(iso_day, "us").astype("int64"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(out: str, sf: float = 0.01, seed: int = 1337) -> None:
    rng = np.random.default_rng(seed)
    f = sf / 0.01
    n_cust = int(1500 * f)
    n_supp = int(100 * f)
    n_part = int(2000 * f)
    n_ord = int(15000 * f)
    n_evt = int(10000 * f)
    n_doc = int(500 * f)
    n_emb = int(500 * f)
    os.makedirs(out, exist_ok=True)

    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                # different region mapping than seed 42 (i*3 % 5, still
                # covering all regions)
                "n_regionkey": pa.array([(i * 3) % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    # nation 13 gets NO customers (empty dim group)
    nat_choices = np.array([i for i in range(25) if i != 13])
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.choice(nat_choices, n_cust), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
                "c_mktsegment": list(rng.choice(SEGMENTS, n_cust)),
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
            }
        ),
    )
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{rng.choice(ADJECTIVES)} {rng.choice(NOUNS)}"
                    for _ in range(n_part)
                ],
                "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
                "p_type": list(rng.choice(PTYPES, n_part)),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
            }
        ),
    )

    # customer (1337*f mod n_cust) gets NO orders (empty fact group)
    lonely = int(1337 * f) % n_cust
    cust_pool = np.array([i for i in range(n_cust) if i != lonely])
    o_cust = rng.choice(cust_pool, n_ord)
    day0, day1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    o_days = rng.integers(0, (day1 - day0) // DAY_US + 1, n_ord)
    o_orderdate = day0 + o_days * DAY_US
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(o_cust, pa.int64()),
                "o_orderstatus": list(rng.choice(["P", "O", "F"], n_ord)),
                "o_totalprice": np.round(rng.uniform(900.0, 400000.0, n_ord), 2),
                "o_orderdate": pa.array(o_orderdate, pa.timestamp("us")),
                "o_orderpriority": list(rng.choice(PRIORITIES, n_ord)),
            }
        ),
    )

    # lineitem: 1..7 lines per order (driver avg ~4, max 13); order 77
    # is a planted 400-line whale
    lines_per = rng.integers(1, 8, n_ord)
    whale = min(77, n_ord - 1)
    lines_per[whale] = 400
    lok, lln = [], []
    for ok, c in enumerate(lines_per):
        lok.extend([ok] * c)
        lln.extend(range(1, c + 1))
    # duplicate 5 (orderkey, linenumber) natural keys
    for i in range(5):
        lok.append(lok[i * 97])
        lln.append(lln[i * 97])
    n_li = len(lok)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship = np.array([o_orderdate[ok] for ok in lok]) + rng.integers(
        1, 121, n_li
    ) * DAY_US
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lok, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(lln, pa.int32()),
                "l_quantity": qty,
                "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": list(rng.choice(["A", "N", "R"], n_li)),
                "l_linestatus": list(rng.choice(["O", "F"], n_li)),
                "l_shipdate": pa.array(ship, pa.timestamp("us")),
            }
        ),
    )

    # events — ns timestamps, ties, dup ids, skewed user, null groups
    eid = np.arange(n_evt, dtype=np.int64)
    ndup = min(20, n_evt // 4)
    eid[-ndup:] = eid[:ndup]  # duplicate natural keys
    users = rng.integers(0, 150, n_evt)
    users[rng.random(n_evt) < 0.10] = 0  # ~10% skew onto user 0
    t0, t1 = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    ets = rng.integers(t0, t1, n_evt)
    snap = rng.random(n_evt) < 0.30
    ets[snap] -= ets[snap] % 3_600_000_000  # hour-boundary ties
    tie_rows = np.flatnonzero(users == 0)[:50]
    ets[tie_rows] = _ts_us("2024-01-15T12:00:00")  # one exact-ts pile-up
    etype = rng.choice(EVENT_TYPES, n_evt, p=[0.28, 0.28, 0.22, 0.215, 0.005])
    value = np.round(rng.uniform(0.01, 500.0, n_evt), 2)
    vmask = rng.random(n_evt) < 0.01
    vmask |= users == 7  # one user entirely null
    props = [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]
    pnull = rng.random(n_evt) < 0.005
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ets * 1000, pa.timestamp("ns")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": list(etype),
                "value": pa.array(
                    [None if m else v for v, m in zip(value, vmask)], pa.float64()
                ),
                "props": [None if m else p for p, m in zip(props, pnull)],
            }
        ),
    )

    # documents — same vocab, planted dup/near-dup/degenerate texts
    def _salad(n_words: int) -> str:
        return " ".join(rng.choice(VOCAB, n_words)) + " "

    texts = [_salad(int(w)) for w in rng.integers(15, 90, n_doc)]
    langs = list(rng.choice(LANGS, n_doc, p=[0.45, 0.2, 0.2, 0.15]))
    sources = [f"src{s}" for s in rng.choice(
        [i for i in range(20) if i != 13], n_doc
    )]
    if n_doc >= 50:
        texts[11] = texts[10]
        texts[12] = texts[10]  # exact-dup group of 3
        texts[21] = texts[20]  # exact-dup pair
        w = texts[30].split()
        w[len(w) // 2] = "vector"
        texts[31] = " ".join(w) + " "  # one-word-edit near-dup
        texts[41] = texts[40] + "window "  # containment pair
        texts[42] = ""  # empty
        texts[43] = " "  # whitespace-only
        texts[44] = "spark "  # single word
        texts[45] = texts[46] * 50  # length outlier
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # embeddings — unit-norm, label 9 absent, planted exact/near ties
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    if n_emb >= 110:
        vecs[101] = vecs[100]  # bit-identical duplicate under another id
        v = vecs[100].astype(np.float64)
        v[0] += 1e-7
        vecs[102] = (v / np.linalg.norm(v)).astype(np.float32)  # near-tie
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(rng.integers(0, 9, n_emb), pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="shadow_testdata/sf0.01")
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1337)
    a = ap.parse_args()
    print(f"shadow testdata -> {a.out} (sf={a.sf}, seed={a.seed})")
    generate(a.out, a.sf, a.seed)
