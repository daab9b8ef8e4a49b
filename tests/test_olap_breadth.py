"""Semantic tests for the B9–B13 breadth plans and A15–A20 enrich plans
beyond oracle parity (test_duckdb_parity.py covers value equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    """HLL(rsd=1%) must land within 5% of the exact distinct count."""
    from ojo_daps_mirror_spark.sources import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in plans.QUERIES["approx_distinct_users"](spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= max(1, 0.05 * exact[et]), et


def test_soc_substring_exact_beats_substring(spark):
    """A job title that IS a lookup title must match itself (type 0)."""
    rows = plans.QUERIES["soc_substring_match"](spark, SF).collect()
    by_job = {r["job_id"]: r for r in rows}
    # p_partkey % 3 == 0 parts are in the exact lookup by construction.
    from ojo_daps_mirror_spark.sources import load_table

    names = {
        r["p_partkey"]: r["p_name"]
        for r in load_table(spark, SF, "part").collect()
    }
    exact_jobs = [k for k in names if k % 3 == 0]
    assert exact_jobs
    for k in exact_jobs:
        assert by_job[k]["match_type"] == 0, k
        assert by_job[k]["std_title"] == names[k], k
    # Every part matches at least via its last word.
    assert set(by_job) == set(names)


def test_near_dup_windowed_subset_of_global(spark):
    """Window-scoped pairs can only ever be a subset of the global
    near-dup pair set at the same threshold."""
    windowed = {
        (r["id_a"], r["id_b"])
        for r in plans.QUERIES["near_dup_windowed"](spark, SF).collect()
    }
    global_ = {
        (r["id_a"], r["id_b"])
        for r in plans.QUERIES["near_dup_cosine"](spark, SF).collect()
    }
    assert windowed <= global_
    assert windowed  # threshold chosen so windows aren't empty


def test_rollup_grand_total_consistent(spark):
    """The ROLLUP grand total must equal the sum of the detail rows."""
    rows = plans.QUERIES["revenue_rollup"](spark, SF).collect()
    detail = sum(r["revenue"] for r in rows if r["grp"] == 0)
    total = [r["revenue"] for r in rows if r["grp"] == 3]
    assert len(total) == 1
    assert abs(total[0] - detail) < 1e-2


def test_requires_degree_flags_known_terms(spark):
    """Docs whose cleaned text contains a degree term are flagged; the
    stripped last term must NOT count (truncation guard)."""
    from ojo_daps_mirror_spark.plans.enrich_plans import DEGREE_TERMS
    from ojo_daps_mirror_spark.sources import load_table

    flags = {
        r["doc_id"]: r["requires_degree"]
        for r in plans.QUERIES["requires_degree"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    for r in docs:
        words = r["text"].split()
        expect = int(any(w in DEGREE_TERMS for w in words[:-1]))
        assert flags[r["doc_id"]] == expect, r["doc_id"]


# ---------------------------------------------------------------- B43/B44


def test_interval_overlap_pairs_truly_overlap(spark, sf_dir):
    import datetime

    from ojo_daps_mirror_spark import plans

    plans.load_all()
    rows = plans.QUERIES["interval_overlap_join"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r.overlap_hours > 0


def test_interval_overlap_no_nlj(spark, sf_dir):
    import contextlib
    import io

    from ojo_daps_mirror_spark import plans

    plans.load_all()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES["interval_overlap_join"](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert ") BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_rolling_distinct_users_matches_direct_count(spark, sf_dir):
    import datetime

    from pyspark.sql import functions as F

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.sources import load_table

    plans.load_all()
    rows = {r.day: r.rolling_users for r in plans.QUERIES[
        "rolling_distinct_users"](spark, sf_dir).collect()}
    act = [
        (r.user_id, r.day)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    ]
    for day_str, n in list(rows.items())[:10]:
        d = datetime.date.fromisoformat(day_str)
        manual = len(
            {u for u, ad in act if d - datetime.timedelta(days=6) <= ad <= d}
        )
        assert n == manual


# ---------------------------------------------------------------- B45/B46/C63


def test_semi_additive_balance_is_closing_not_sum(spark, sf_dir):
    from pyspark.sql import functions as F

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.sources import load_table

    plans.load_all()
    rows = plans.QUERIES["semi_additive_balance"](spark, sf_dir).collect()
    # the LAST week's total must equal the sum of every active-that-week
    # user's full running balance (cumulative over all history)
    events = load_table(spark, sf_dir, "events").collect()
    events.sort(key=lambda e: (e.ts, e.event_id))
    bal, last_week_balance = {}, {}
    import datetime

    def week_of(ts):
        d = ts.date()
        return (d - datetime.timedelta(days=d.weekday())).isoformat()

    per_week_close = {}
    for ev in events:
        bal[ev.user_id] = bal.get(ev.user_id, 0.0) + ev.value
        per_week_close.setdefault(week_of(ev.ts), {})[ev.user_id] = bal[ev.user_id]
    for r in rows:
        manual = per_week_close[r.week]
        assert r.n_active_users == len(manual)
        assert abs(r.total_closing_balance - sum(manual.values())) < 1e-2


def test_transition_matrix_rows_normalise(spark, sf_dir):
    from ojo_daps_mirror_spark import plans

    plans.load_all()
    rows = plans.QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.prob)
    for probs in by_from.values():
        assert abs(sum(probs) - 1.0) < 1e-4


def test_lang_confusion_diagonal_dominates(spark, sf_dir):
    from ojo_daps_mirror_spark import plans

    plans.load_all()
    rows = plans.QUERIES["lang_id_confusion"](spark, sf_dir).collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r.true_lang, {})[r.pred_lang] = r.share_of_true
        assert 0.0 < r.share_of_true <= 1.0
    # shares per true language sum to 1
    for shares in by_true.values():
        assert abs(sum(shares.values()) - 1.0) < 1e-4
