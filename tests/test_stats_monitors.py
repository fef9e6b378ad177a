"""Semantic tests for the statistical-monitoring family
(queries_stats.py): planted effects must move the statistics the right
way, independent of the DuckDB oracle hash-match the driver performs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _mk_rows(spec):
    """spec: list of (event_type, values). Deterministic timestamps."""
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for etype, values in spec:
        for i, v in enumerate(values):
            rows.append((eid, base + dt.timedelta(minutes=eid), eid % 7, etype, float(v), "{}"))
            eid += 1
    return rows


@pytest.fixture(scope="module")
def drift_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stats_events")
    # "same" ~ the bulk; "shifted" is translated by +50 — a pure location
    # shift both KS and AUC must flag.
    bulk = [round(10 + 0.37 * i % 20, 2) for i in range(200)]
    shifted = [round(60 + 0.37 * i % 20, 2) for i in range(100)]
    return _write_events(spark, tmp, _mk_rows([("same_a", bulk), ("same_b", bulk), ("shifted", shifted)]))


def test_ks_flags_planted_shift(spark, drift_dir):
    from tcdb_spark.plans.queries_stats import ks_drift

    out = {r["event_type"]: r["ks_d"] for r in ks_drift(spark, drift_dir).collect()}
    # The shifted cohort is disjoint in support from the rest: D = 1.
    assert out["shifted"] == pytest.approx(1.0)
    # The two identical bulk cohorts still differ from their leave-one-out
    # rest (the rest contains the shifted mass), but far less.
    assert out["same_a"] < 0.5 and out["same_b"] < 0.5


def test_auc_direction_and_bounds(spark, drift_dir):
    from tcdb_spark.plans.queries_stats import rank_sum_shift

    out = {r["event_type"]: r["auc"] for r in rank_sum_shift(spark, drift_dir).collect()}
    # Shifted cohort stochastically dominates the rest entirely: AUC = 1.
    assert out["shifted"] == pytest.approx(1.0)
    # Identical cohorts vs rest-including-shifted-mass: AUC < 0.5 (the
    # rest has higher mass above them), and symmetric between the twins.
    assert out["same_a"] == pytest.approx(out["same_b"])
    assert 0.0 <= out["same_a"] < 0.5


def test_binned_twins_equal_exact_on_discrete_fixture(spark):
    """On a value column whose distinct values land one-per-bin (64
    integer values under 64 data-derived bins), the binned production
    twins ARE the exact lanes bit-for-bit: same D, same u2, same auc —
    the lossless-when-discrete contract that lets them share the exact
    oracle convention."""
    from tcdb_spark.plans.queries_stats import (
        binned_value_frame,
        ks_by_cohort,
        rank_shift_by_cohort,
    )

    rows = [("lo", float(v)) for v in range(0, 40)]
    rows += [("hi", float(v)) for v in range(24, 64)]
    rows += [("mid", float(v)) for v in range(12, 52)]
    df = spark.createDataFrame(rows, "g string, v double")
    binned = binned_value_frame(df, "g", "v", bins=64)

    exact_ks = {r["g"]: r for r in ks_by_cohort(df, "g", "v").collect()}
    binned_ks = {r["g"]: r for r in ks_by_cohort(binned, "g", "value").collect()}
    assert set(exact_ks) == set(binned_ks)
    for g in exact_ks:
        assert binned_ks[g]["n_cohort"] == exact_ks[g]["n_cohort"]
        assert binned_ks[g]["ks_d"] == exact_ks[g]["ks_d"]  # exact equality

    exact_rs = {r["g"]: r for r in rank_shift_by_cohort(df, "g", "v").collect()}
    binned_rs = {r["g"]: r for r in rank_shift_by_cohort(binned, "g", "value").collect()}
    for g in exact_rs:
        assert binned_rs[g]["u2"] == exact_rs[g]["u2"]
        assert binned_rs[g]["auc"] == exact_rs[g]["auc"]


def test_binned_ks_bounded_error_on_continuous(spark, drift_dir):
    """On continuous data the binned D under-reads the exact D by at
    most the within-bin CDF spread — and still flags the planted shift
    at full strength (disjoint support -> D = 1 in both)."""
    from tcdb_spark.plans.queries_stats import ks_drift, ks_drift_binned

    exact = {r["event_type"]: r["ks_d"] for r in ks_drift(spark, drift_dir).collect()}
    binned = {r["event_type"]: r["ks_d"] for r in ks_drift_binned(spark, drift_dir).collect()}
    assert binned["shifted"] == pytest.approx(1.0)
    for g in exact:
        assert binned[g] <= exact[g] + 1e-12  # binning never inflates D
        assert exact[g] - binned[g] < 0.1  # 64 bins resolve this fixture


def test_ks_from_counts_matches_binned_batch(spark):
    """The streaming-state read-out (leave-one-out KS from a wide
    (cohort, c0..c15, n) count matrix) equals the batch ECDF chain run
    on the identical fixed-edge bin ids — the state and the batch lane
    are the same statistic."""
    from tcdb_spark.plans.queries_stats import ks_by_cohort, ks_from_counts
    from tcdb_spark.streaming.pipeline import psi_bin_counts

    rows = [("a", float(10 + (i * 7) % 90)) for i in range(120)]
    rows += [("b", float(140 + (i * 11) % 100)) for i in range(80)]
    rows += [("c", float((i * 13) % 250)) for i in range(100)]
    df = spark.createDataFrame(rows, "cohort string, x double")
    lo, hi, bins = 0.0, 256.0, 16

    state = psi_bin_counts(df, "cohort", "x", lo, hi, bins)
    got = {r["cohort"]: r for r in ks_from_counts(state, "cohort", bins).collect()}

    width = (hi - lo) / bins
    binned = df.select(
        "cohort",
        F.least(
            F.greatest(F.floor((F.col("x") - lo) / width), F.lit(0)), F.lit(bins - 1)
        ).cast("int").alias("value"),
    )
    want = {r["cohort"]: r for r in ks_by_cohort(binned, "cohort", "value").collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g]["n_cohort"] == want[g]["n_cohort"]
        assert got[g]["ks_d"] == pytest.approx(want[g]["ks_d"], abs=1e-12)

    # the SAME state also serves the rank-sum monitor: u2 (exact
    # integer) and auc must equal the batch grouped-midrank chain
    from tcdb_spark.plans.queries_stats import (
        rank_shift_by_cohort,
        rank_sum_from_counts,
    )

    got_rs = {
        r["cohort"]: r for r in rank_sum_from_counts(state, "cohort", bins).collect()
    }
    want_rs = {
        r["cohort"]: r for r in rank_shift_by_cohort(binned, "cohort", "value").collect()
    }
    for g in want_rs:
        assert got_rs[g]["u2"] == want_rs[g]["u2"]
        assert got_rs[g]["auc"] == pytest.approx(want_rs[g]["auc"], abs=1e-12)


def test_ks_from_counts_single_cohort_is_null(spark):
    from tcdb_spark.plans.queries_stats import ks_from_counts
    from tcdb_spark.streaming.pipeline import psi_bin_counts

    df = spark.createDataFrame([("only", 5.0), ("only", 9.0)], "cohort string, x double")
    state = psi_bin_counts(df, "cohort", "x", 0.0, 16.0, 16)
    row = ks_from_counts(state, "cohort", 16).collect()[0]
    assert row["ks_d"] is None  # no comparison population, never a crash


def test_cusum_finds_planted_mean_shift(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import cusum_changepoint

    # 100 values at 10.0 then 100 at 30.0: CUSUM argmax must sit exactly
    # at the last pre-shift row (k=100).
    rows = _mk_rows([("series", [10.0] * 100 + [30.0] * 100)])
    d = _write_events(spark, tmp_path, rows)
    row = cusum_changepoint(spark, d).collect()[0]
    assert row["cp_event_id"] == 99  # 0-based ids, 100th row
    # Max deviation for a two-level step: k*(S_n/n - mu1) at the break =
    # 100*(20-10) = 1000 value units.
    assert row["cusum_stat"] == pytest.approx(1000.0)


def test_cusum_tiebreak_deterministic(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import cusum_changepoint

    # Constant series: every prefix has stat2 = 0; tiebreak must pick the
    # FIRST row (ts, event_id ascending), not an arbitrary one.
    rows = _mk_rows([("flat", [5.0] * 50)])
    d = _write_events(spark, tmp_path, rows)
    row = cusum_changepoint(spark, d).collect()[0]
    assert row["stat2"] == 0 and row["cp_event_id"] == 0


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_kappa_perfect_and_degenerate(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import annotator_kappa

    # src_perfect: detector and label always agree AND both marginals are
    # split across two classes -> kappa == 1.  src_degenerate: every doc
    # is labeled en and guessed en -> pe == 1 -> NULL kappa (not a crash,
    # DEVNOTES #44).
    en = "the a data of things"  # hits en markers
    es = "table row fast stuff here"  # hits es markers
    rows = [
        (1, en, "en", "src_perfect", 20),
        (2, es, "es", "src_perfect", 25),
        (3, en, "en", "src_degenerate", 20),
        (4, en, "en", "src_degenerate", 20),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in annotator_kappa(spark, d).collect()}
    assert out["src_perfect"]["kappa"] == pytest.approx(1.0)
    assert out["src_perfect"]["n_agree"] == 2
    assert out["src_degenerate"]["kappa"] is None


def test_preference_pairs_margin_and_skip(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import preference_pairs

    # srcA: clear quality gap -> one pair with positive margin, chosen is
    # the stopword-rich doc.  srcB: two identical docs -> tie -> NO pair.
    rows = [
        (1, "the a of and to in is the a of", "en", "srcA", 30),
        (2, "zzz,,,!!!...", "en", "srcA", 12),
        (3, "same text here", "en", "srcB", 14),
        (4, "same text here", "en", "srcB", 14),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = preference_pairs(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["source"] == "srcA" and r["chosen_doc"] == 1 and r["rejected_doc"] == 2
    assert r["margin"] > 0


def test_bootstrap_ci_brackets_true_mean(spark, tmp_path_factory):
    from tcdb_spark.plans.queries_stats import bootstrap_ci_mean

    tmp = tmp_path_factory.mktemp("boot_events")
    # 400 values symmetric around 25.0 -> CI must bracket 25 tightly,
    # lo < mid < hi, and the whole thing must be deterministic.
    vals = [25.0 + ((i % 21) - 10) * 0.5 for i in range(400)]
    d = _write_events(spark, tmp, _mk_rows([("m", vals)]))
    r1 = bootstrap_ci_mean(spark, d).collect()[0]
    r2 = bootstrap_ci_mean(spark, d).collect()[0]
    assert (r1["boot_lo"], r1["boot_mid"], r1["boot_hi"]) == (
        r2["boot_lo"], r2["boot_mid"], r2["boot_hi"])  # seeded-hash determinism
    assert r1["boot_lo"] < r1["boot_mid"] < r1["boot_hi"]
    assert r1["boot_lo"] < 25.0 < r1["boot_hi"]
    assert r1["boot_hi"] - r1["boot_lo"] < 2.0  # ~2*1.96*sd/sqrt(n) scale


def test_ab_test_planted_effect(spark, tmp_path):
    from tcdb_spark.plans.queries_stats import ab_test_proportions

    # Arm 0 = even users, arm 1 = odd. "treat" events go to even users
    # only (huge effect); "common" events go to everyone (z == 0 ...
    # exactly, since both proportions are 1).
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(40):
        rows.append((eid, base, u, "common", 1.0, "{}")); eid += 1
        if u % 2 == 0:
            rows.append((eid, base, u, "treat", 1.0, "{}")); eid += 1
    d = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in ab_test_proportions(spark, d).collect()}
    t = out["treat"]
    assert t["x_a"] == 20 and t["x_b"] == 0 and t["n_a"] == 20 and t["n_b"] == 20
    assert t["z_stat"] is not None and t["z_stat"] > 5.0
    # all-converted degenerate -> pooled p = 1 -> NULL (no ANSI crash)
    assert out["common"]["z_stat"] is None
