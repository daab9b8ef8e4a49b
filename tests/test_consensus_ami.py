"""A40 consensus member selection: NMI argmax == true AMI argmax.

The reference scores ensemble members with sklearn's ADJUSTED mutual
information (cluster_utils.py:272) and picks the argmax of the mean
pairwise row. A40 (consensus_partition_select) scores with closed-form
chance-UNcorrected NMI and argues in its docstring that the argmax is
the same because the hypergeometric chance term is near-constant
across members of one ensemble over one node set. This test turns that
assertion into a fact: it computes TRUE AMI — exact hypergeometric
E[MI], pure Python, no sklearn — over the sf0.001 ensemble and asserts
both selectors pick the same member.
"""

from __future__ import annotations

import math
from collections import Counter

from ojo_daps_mirror_spark.operators.graph import label_propagation
from ojo_daps_mirror_spark.operators.lineage import cut_lineage
from ojo_daps_mirror_spark.plans.community_plans import (
    CONSENSUS_SALTS,
    consensus_partition_select,
    skill_cooc_edges,
)


def _expected_mi(a_sizes: list[int], b_sizes: list[int], n: int) -> float:
    """Exact hypergeometric E[MI] (Vinh, Epps & Bailey 2010, the model
    sklearn's adjusted_mutual_info_score implements)."""
    lg = math.lgamma
    emi = 0.0
    for ai in a_sizes:
        for bj in b_sizes:
            lo, hi = max(1, ai + bj - n), min(ai, bj)
            for nij in range(lo, hi + 1):
                log_p = (
                    lg(ai + 1)
                    + lg(bj + 1)
                    + lg(n - ai + 1)
                    + lg(n - bj + 1)
                    - lg(n + 1)
                    - lg(nij + 1)
                    - lg(ai - nij + 1)
                    - lg(bj - nij + 1)
                    - lg(n - ai - bj + nij + 1)
                )
                emi += (nij / n) * math.log(n * nij / (ai * bj)) * math.exp(log_p)
    return emi


def _entropy(sizes: list[int], n: int) -> float:
    return -sum((s / n) * math.log(s / n) for s in sizes)


def _ami(la: dict, lb: dict) -> float:
    n = len(la)
    assert set(la) == set(lb) and n > 0
    cont = Counter((la[k], lb[k]) for k in la)
    a_marg = Counter(la.values())
    b_marg = Counter(lb.values())
    mi = sum(
        (nij / n) * math.log(n * nij / (a_marg[i] * b_marg[j]))
        for (i, j), nij in cont.items()
    )
    emi = _expected_mi(list(a_marg.values()), list(b_marg.values()), n)
    ha, hb = _entropy(list(a_marg.values()), n), _entropy(list(b_marg.values()), n)
    denom = 0.5 * (ha + hb) - emi
    return (mi - emi) / denom if denom != 0 else 1.0


def test_nmi_argmax_matches_true_ami_argmax(spark, sf_dir):
    edges = skill_cooc_edges(spark, sf_dir).transform(cut_lineage)
    members = []
    for salt in CONSENSUS_SALTS:
        rows = (
            label_propagation(edges, salt=salt)
            .select("id", "community")
            .collect()
        )
        members.append({r["id"]: r["community"] for r in rows})

    m = len(members)
    ami = [[0.0] * m for _ in range(m)]
    for a in range(m):
        for b in range(a + 1, m):
            ami[a][b] = ami[b][a] = _ami(members[a], members[b])
    mean_ami = [
        sum(ami[k][j] for j in range(m) if j != k) / (m - 1) for k in range(m)
    ]
    # same tie-break as the op: score desc, member asc
    ami_argmax = min(range(m), key=lambda k: (-mean_ami[k], k))

    sel = consensus_partition_select(spark, sf_dir).collect()
    nmi_argmax = [r["member"] for r in sel if r["selected"]]
    assert len(nmi_argmax) == 1
    assert nmi_argmax[0] == ami_argmax, (
        f"NMI selector picked {nmi_argmax[0]}, true-AMI selector picked "
        f"{ami_argmax}: mean AMI row {mean_ami}, scoreboard {sel}"
    )


def test_subclusters_refine_level1_partition(spark, sf_dir):
    """A41's hierarchy contract (cluster_utils.py:674 subcluster_nodes):
    subcommunities REFINE the level-1 partition — every subcommunity
    lies wholly inside one parent community, every level-1 node is
    assigned, and the parent column equals A36's consensus partition."""
    from ojo_daps_mirror_spark.plans import QUERIES

    sub = QUERIES["skill_taxonomy_subclusters"](spark, sf_dir).collect()
    lvl1 = {
        r["skill"]: r["community"]
        for r in QUERIES["skill_communities_consensus"](spark, sf_dir).collect()
    }
    assert {r["skill"] for r in sub} == set(lvl1)
    parent_of_sub: dict[str, str] = {}
    for r in sub:
        assert r["community"] == lvl1[r["skill"]]
        prev = parent_of_sub.setdefault(r["subcommunity"], r["community"])
        assert prev == r["community"], "subcommunity crosses communities"


def test_node_affinity_is_probability_like(spark, sf_dir):
    """A42 (cluster_utils.py:437): rows normalise to ~1, raw affinity
    is within [0, 1], exactly one own-cluster row per node, and a
    node's self-vote makes its own-cluster affinity strictly positive."""
    from collections import defaultdict

    from ojo_daps_mirror_spark.plans import QUERIES

    rows = QUERIES["node_affinity_audit"](spark, sf_dir).collect()
    per_node = defaultdict(list)
    for r in rows:
        assert 0.0 <= r["affinity"] <= 1.0, r
        per_node[r["skill"]].append(r)
    for skill, rs in per_node.items():
        own = [r for r in rs if r["is_own"]]
        assert len(own) == 1, skill
        assert own[0]["affinity"] > 0.0, skill
        assert abs(sum(r["affinity_norm"] for r in rs) - 1.0) < 1e-4, skill


def test_cluster_affinity_matrix_contract(spark, sf_dir):
    """A43 (cluster_utils.py:517): dense communities² matrix, the
    symmetric variant actually symmetric, values in [0, 1], and the
    diagonal (stability) at least as strong as the cluster's mean
    affinity to any OTHER cluster (consensus clusters are the
    majority-vote groups, so self-affinity dominates)."""
    from ojo_daps_mirror_spark.plans import QUERIES

    rows = QUERIES["cluster_affinity_audit"](spark, sf_dir).collect()
    clusters = {r["cluster_a"] for r in rows}
    assert len(rows) == len(clusters) ** 2
    m = {(r["cluster_a"], r["cluster_b"]): r for r in rows}
    for (a, b), r in m.items():
        assert 0.0 <= r["affinity"] <= 1.0, r
        assert abs(r["affinity_sym"] - m[(b, a)]["affinity_sym"]) < 1e-9
        assert r["is_self"] == (a == b)
    for a in clusters:
        diag = m[(a, a)]["affinity"]
        for b in clusters:
            if b != a:
                assert diag >= m[(a, b)]["affinity"], (a, b)
