"""Semantic tests for C51 / B39 / C52."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.plans.llm_plans8 import (
    BEHAV_JACCARD,
    Z_THRESHOLD,
)
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def _plan(spark, sf_dir, key):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES[key](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_gap_fill_is_dense_calendar(spark, sf_dir):
    rows = plans.QUERIES["timeseries_gap_fill"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    lens = {len(v) for v in by_type.values()}
    assert len(lens) == 1  # same dense span for every board
    for chunks in by_type.values():
        days = [r.day for r in chunks]
        assert days == sorted(days)
        # consecutive: number of distinct days equals span length
        import datetime

        d0 = datetime.date.fromisoformat(days[0])
        d1 = datetime.date.fromisoformat(days[-1])
        assert len(days) == (d1 - d0).days + 1


def test_gap_fill_carries_last_observation(spark, sf_dir):
    rows = plans.QUERIES["timeseries_gap_fill"](spark, sf_dir).collect()
    prev = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        if r.was_gap:
            assert r.total_filled == prev.get(r.event_type, 0.0)
        prev[r.event_type] = r.total_filled


def test_anomaly_flags_scored_against_preceding_only(spark, sf_dir):
    rows = plans.QUERIES["weekly_anomaly_flags"](spark, sf_dir).collect()
    import statistics

    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.week)):
        hist = by_type.setdefault(r.event_type, [])
        window = hist[-3:]
        if len(window) >= 2 and statistics.stdev(window) > 0:
            z = (r.n - statistics.mean(window)) / statistics.stdev(window)
            assert abs(r.z_score - z) < 1e-3
            assert r.is_anomaly == (1 if abs(z) > Z_THRESHOLD else 0)
        else:
            assert r.z_score == 0.0 and r.is_anomaly == 0
        hist.append(r.n)


def test_behavior_similarity_pairs_verified(spark, sf_dir):
    rows = plans.QUERIES["user_behavior_similarity"](spark, sf_dir).collect()
    assert rows  # calibrated threshold must fire at test SFs
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs = {}
    for e in sorted(events, key=lambda e: (e.ts, e.event_id)):
        seqs.setdefault(e.user_id, []).append(e.event_type)
    for r in rows[:10]:
        g1 = {
            ">".join(seqs[r.u1][i : i + 3])
            for i in range(len(seqs[r.u1]) - 2)
        }
        g2 = {
            ">".join(seqs[r.u2][i : i + 3])
            for i in range(len(seqs[r.u2]) - 2)
        }
        jac = len(g1 & g2) / len(g1 | g2)
        assert abs(jac - r.jaccard) < 1e-3
        assert jac >= BEHAV_JACCARD


def test_behavior_similarity_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "user_behavior_similarity")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
