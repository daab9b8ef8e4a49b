"""Semantic + plan tests for the C42–C44 operators."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def _plan(spark, sf_dir, key):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES[key](spark, sf_dir).explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- C42


def test_overlap_matrix_bounds(spark, sf_dir):
    rows = plans.QUERIES["cross_source_overlap"](spark, sf_dir).collect()
    assert rows
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.s1 < r.s2
        assert 0 < r.shared <= min(r.n1, r.n2)
        assert 0.0 < r.jaccard <= 1.0


def test_overlap_no_self_join_no_python(spark, sf_dir):
    """The Spark plan pairs sources from per-shingle source SETS —
    no shingle-grain self-join, no cartesian, no Python."""
    plan = _plan(spark, sf_dir, "cross_source_overlap")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one join family: the two tiny broadcast total attaches
    assert plan.count(") SortMergeJoin") == 0


# ---------------------------------------------------------------- C43


def test_percentile_blend_bounds_and_extremes(spark, sf_dir):
    rows = plans.QUERIES["quality_percentile_blend"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    for r in rows:
        assert 0.0 <= r.quality_blend <= 1.0
    # the doc with the largest (n_tokens, doc_id) has pr_len exactly 1
    top = max(rows, key=lambda r: (r.n_tokens, r.doc_id))
    assert top.quality_blend >= 0.5  # pr_len = 1, pr_stop >= 0


# ---------------------------------------------------------------- C44


def test_cdc_merge_partitions_actions(spark, sf_dir):
    rows = plans.QUERIES["cdc_merge"](spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    custkeys = {r.c_custkey for r in cust.select("c_custkey").collect()}
    buyers = {
        r.user_id
        for r in events.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert {r.custkey for r in rows} == custkeys | buyers
    by_action = {}
    for r in rows:
        by_action.setdefault(r.action, set()).add(r.custkey)
    assert by_action.get("update", set()) == custkeys & buyers
    assert by_action.get("keep", set()) == custkeys - buyers
    assert by_action.get("insert", set()) == buyers - custkeys


def test_cdc_merge_changelog_collapses_before_join(spark, sf_dir):
    """The raw event log must aggregate to one row per key BEFORE the
    merge join — the join input is the argmax aggregate, not the log."""
    plan = _plan(spark, sf_dir, "cdc_merge")
    assert "FullOuter" in plan
    # max_by partial aggregation happens below the join
    assert "max_by" in plan or "any_value" in plan
