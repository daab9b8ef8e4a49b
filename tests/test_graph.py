"""PageRank: the distributed loop must match exact power iteration."""

from __future__ import annotations

import numpy as np

from ojo_daps_mirror_spark import plans

plans.load_all()


def _numpy_pagerank(edges, alpha, iters):
    """Dense reference power iteration with uniform dangling spread."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dm = 0.0
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
            else:
                dm += r[i]
        r = (1 - alpha) / n + alpha * (contrib + dm / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_power_iteration(spark, sf_dir):
    from ojo_daps_mirror_spark.operators.graph import (
        PAGERANK_ALPHA,
        PAGERANK_ITERS,
        pagerank,
    )
    from ojo_daps_mirror_spark.plans.graph_plans import trade_edges

    edge_rows = [
        (r["src"], r["dst"], r["weight"])
        for r in trade_edges(spark, sf_dir).collect()
    ]
    expected = _numpy_pagerank(edge_rows, PAGERANK_ALPHA, PAGERANK_ITERS)

    got = {
        r["id"]: r["rank"]
        for r in pagerank(trade_edges(spark, sf_dir)).collect()
    }
    assert set(got) == set(expected)
    diffs = [abs(got[v] - expected[v]) for v in got]
    assert max(diffs) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9  # proper distribution


def test_pagerank_dangling_nodes_keep_mass():
    """A pure sink keeps teleport + dangling mass; totals stay 1."""
    from ojo_daps_mirror_spark.operators.graph import pagerank
    from ojo_daps_mirror_spark.session import get_spark

    spark = get_spark(app_name="ojo-tests")
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)], ["src", "dst", "weight"]
    )
    got = {r["id"]: r["rank"] for r in pagerank(edges).collect()}
    expected = _numpy_pagerank(
        [("a", "b", 1.0), ("b", "c", 1.0)], 0.85, 10
    )
    assert abs(sum(got.values()) - 1.0) < 1e-12
    for v in got:
        assert abs(got[v] - expected[v]) < 1e-12
    assert got["c"] > got["b"] > got["a"]  # downstream accumulates rank


def test_label_propagation_two_cliques(spark):
    """Closed-form graph: two weighted triangles joined by one weak
    bridge edge must resolve to exactly two communities, each labelled
    by its lexicographically-smallest member."""
    from ojo_daps_mirror_spark.operators.graph import label_propagation

    tri1 = [("a", "b"), ("a", "c"), ("b", "c")]
    tri2 = [("x", "y"), ("x", "z"), ("y", "z")]
    strong = [(s, d, 5.0) for s, d in tri1 + tri2]
    bridge = [("c", "x", 1.0)]
    directed = strong + bridge
    edges = spark.createDataFrame(
        directed + [(d, s, w) for s, d, w in directed],
        "src string, dst string, weight double",
    )
    out = {r["id"]: r["community"] for r in label_propagation(edges).collect()}
    assert out == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "x",
    }


def test_two_hop_candidates_manual(spark, sf_dir):
    from ojo_daps_mirror_spark import plans

    plans.load_all()
    edges = {
        (r.u1, r.u2)
        for r in plans.QUERIES["user_behavior_similarity"](spark, sf_dir).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = plans.QUERIES["two_hop_candidates"](spark, sf_dir).collect()
    got = {r.user_id: (r.n_1hop, r.n_2hop_new) for r in rows}
    manual = {}
    for u, nbrs in adj.items():
        two = set()
        for w in nbrs:
            two |= adj.get(w, set())
        two -= {u}
        two -= nbrs
        manual[u] = (len(nbrs), len(two))
    assert got == manual
