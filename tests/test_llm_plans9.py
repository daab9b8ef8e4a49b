"""Semantic + plan tests for C53–C55."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.plans.llm_plans9 import RRF_K, RRF_TOP

plans.load_all()


def _plan(spark, sf_dir, key):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES[key](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_blocked_topk_equals_bruteforce(spark, sf_dir):
    """The streaming blocked plan must reproduce the NLJ baseline
    EXACTLY — same neighbors, same ranks, same rounded sims."""
    blocked = [
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in plans.QUERIES["ann_topk_blocked"](spark, sf_dir).collect()
    ]
    brute = [
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in plans.QUERIES["ann_topk_bruteforce"](spark, sf_dir).collect()
    ]
    assert blocked == brute


def test_blocked_topk_has_no_nlj(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann_topk_blocked")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_scores_consistent(spark, sf_dir):
    rows = plans.QUERIES["hybrid_search_rrf"](spark, sf_dir).collect()
    assert len(rows) == RRF_TOP
    rrfs = [r.rrf for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
    for r in rows:
        expect = 1.0 / (RRF_K + r.kw_rank) + 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf - expect) < 1e-5
        assert r.kw_rank >= 1 and r.vec_rank >= 1


def test_triangles_are_closed(spark, sf_dir):
    """Every counted triangle must be three mutual similarity edges.
    Recheck by closing the edge set on the driver (small by design)."""
    edges = {
        (r.u1, r.u2)
        for r in plans.QUERIES["user_behavior_similarity"](spark, sf_dir).collect()
    }
    tri_count = {}
    es = sorted(edges)
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    manual = {}
    for a, b in es:
        for c in adj.get(b, ()):
            if (a, c) in edges:
                for u in (a, b, c):
                    manual[u] = manual.get(u, 0) + 1
    got = {
        r.user_id: r.n_triangles
        for r in plans.QUERIES["behavior_triangles"](spark, sf_dir).collect()
    }
    assert got == manual


def test_approx_heavy_hitters_contains_exact_top(spark, sf_dir):
    """With the sketch budget far above the gram cardinality at test
    SFs the sketch is exact: same items, same counts, same order as
    the exact C32 heavy hitters."""
    approx = [
        (r.gram, r.doc_freq)
        for r in plans.QUERIES["heavy_hitters_approx"](spark, sf_dir).collect()
    ]
    exact = [
        (r.gram, r.doc_freq)
        for r in plans.QUERIES["heavy_hitters_ngrams"](spark, sf_dir).collect()
    ]
    # Ties at the k-th count make "the" top-20 ambiguous: both engines
    # return a valid top-20 but may pick different tied tail items. The
    # invariants that hold regardless: every STRICTLY-above-boundary
    # item appears in both with the same count, and nothing below the
    # boundary sneaks in.
    boundary = min(c for _, c in exact)
    assert {p for p in approx if p[1] > boundary} == {
        p for p in exact if p[1] > boundary
    }
    assert all(c >= boundary for _, c in approx)
    assert len(approx) == len(exact)


def test_approx_heavy_hitters_single_aggregate_no_gram_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "heavy_hitters_approx")
    # one global sketch aggregate: no gram-grain hash partitioning
    assert "hashpartitioning(gram" not in plan


# ---------------------------------------------------------------- C58/C59


def test_pmi_pairs_verified_manually(spark, sf_dir):
    from ojo_daps_mirror_spark.sources import load_table
    import math

    rows = plans.QUERIES["pmi_collocations"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").collect()
    sets = [sorted(set(r.text.split()))[:100] for r in docs]
    n = len(sets)
    for r in rows[:5]:
        df1 = sum(1 for s in sets if r.t1 in s)
        df2 = sum(1 for s in sets if r.t2 in s)
        df_ab = sum(1 for s in sets if r.t1 in s and r.t2 in s)
        assert (df1, df2, df_ab) == (r.df1, r.df2, r.df_ab)
        assert abs(r.pmi - math.log(n * df_ab / (df1 * df2))) < 1e-4


def test_embedding_outliers_zscores_standardised(spark, sf_dir):
    import statistics

    rows = plans.QUERIES["embedding_outliers"](spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        zs = [r.z_score for r in rs]
        # standardised within the label: mean ~0, std ~1
        assert abs(statistics.mean(zs)) < 1e-2
        assert abs(statistics.stdev(zs) - 1.0) < 1e-2
        for r in rs:
            assert r.is_outlier == (1 if r.z_score > 2.0 else 0)


def test_dataset_diff_partitions(spark, sf_dir):
    from ojo_daps_mirror_spark.plans.llm_plans10 import DIFF_OLD_MOD, DIFF_OLD_REM
    from ojo_daps_mirror_spark.sources import load_table

    rows = plans.QUERIES["dataset_diff"](spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.change, set()).add(r.doc_id)
    docs = {r.doc_id for r in load_table(spark, sf_dir, "documents").collect()}
    # added = exactly the batch absent from the old snapshot
    assert by.get("added", set()) == {
        d for d in docs if d % DIFF_OLD_MOD == DIFF_OLD_REM
    }
    # changed = the drifted rows still present in both
    assert by.get("changed", set()) == {
        d for d in docs if d % 97 == 0 and d % DIFF_OLD_MOD != DIFF_OLD_REM
    }
    # nothing removed in this synthetic pair, and no overlap
    assert "removed" not in by
    assert not (by.get("added", set()) & by.get("changed", set()))
