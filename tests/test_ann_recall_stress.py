"""Small-scale pin of the planted near-neighbour ANN recall harness
(scripts/ann_recall_stress.py — VERDICT r6 #4).

Full records live in bench_out/ann_recall_stress_sf{0.2,1.6}.json;
this pins the harness semantics at pytest scale so a regression in
either the harness or an ANN op fails the suite:

- the exact brute-force control finds every eligible planted pair;
- tier-0 (exact duplicate) recall is 1.0 for EVERY index — identical
  vectors share every bucket/cell/code, and the PQ shortlist is
  tie-inclusive (the r7 fix: an id tie-break on code-identical ADC
  ties dropped exact duplicates at 16x);
- soundness: found never exceeds eligible.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def planted(spark, sf_dir, tmp_path_factory):
    import scripts.ann_recall_stress as ars

    out = str(tmp_path_factory.mktemp("ann_recall2x"))
    orig = ars.BASE_SF_DIR
    ars.BASE_SF_DIR = sf_dir
    try:
        ars.build(spark, out, replicas=2)
    finally:
        ars.BASE_SF_DIR = orig
    return out


def test_ann_recall_contracts(spark, planted):
    import scripts.ann_recall_stress as ars

    rec = ars.measure(spark, planted, replicas=2)
    ops = rec["ops"]
    assert rec["n_eligible"] > 0
    # exact control: every eligible planted pair found, every tier
    for t, v in ops[ars.EXACT_OP]["tiers"].items():
        assert v["recall"] == 1.0, (t, v)
    # tier-0 (exact duplicate) floor on every index
    for op in ars.ANN_OPS:
        t0 = ops[op]["tiers"].get(0)
        assert t0 is not None, op
        assert t0["recall"] == 1.0, (op, t0)
    # soundness everywhere
    for op, r in ops.items():
        for t, v in r["tiers"].items():
            assert v["found"] <= v["eligible"], (op, t, v)
