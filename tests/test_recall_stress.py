"""Small-scale pin of the planted-duplicate recall harness
(scripts/recall_stress.py — SURVEY §6.6).

The full records live in bench_out/recall_stress_sf{0.2,1.6,6.4}.json;
this test rebuilds the 2x corpus at sf0.01 into a tmp dir and asserts
the structural contracts that must hold at ANY scale:

- ground truth shape: planted pairs exist for every replica > 0, ids
  are base/base+r·SPAN oriented, tiers partition the slice;
- tier-0 (verbatim) recall is 1.0 for dedup_exact AND the minhash
  index (identical docs share every band signature);
- simhash found == eligible (the 4-band pigeonhole covers ham ≤ 3
  EXACTLY — any miss is a bug, not an approximation);
- ngram/minhash found ⊆ eligible (the index never "finds" a pair the
  exact verifier would reject — soundness).

The harness itself caught a real analyzer trap when first run (HOF
lambda outer refs binding to a lateral alias); this pin keeps the
build deterministic against that class of regression.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory, monkeypatch_module=None):
    import scripts.recall_stress as rs

    out = str(tmp_path_factory.mktemp("recall2x"))
    old = rs.BASE_SF_DIR
    rs.BASE_SF_DIR = SF_SMALL
    try:
        rs.build(spark, out, replicas=2)
    finally:
        rs.BASE_SF_DIR = old
    return out


def test_ground_truth_shape(spark, planted):
    import scripts.recall_stress as rs

    truth = spark.read.parquet(
        os.path.join(planted, "planted_pairs.parquet")
    ).collect()
    assert truth, "no planted pairs at 2x"
    for r in truth:
        assert r["replica"] == 1
        assert r["dup_id"] == r["base_id"] + rs.ID_SPAN
        assert r["tier"] == r["base_id"] % 3
    # the planted slice is the deterministic PLANT_FRAC of base docs
    n_base = spark.read.parquet(
        os.path.join(SF_SMALL, "documents.parquet")
    ).count()
    frac = len(truth) / n_base
    assert 0.3 * rs.PLANT_FRAC <= frac <= 3 * rs.PLANT_FRAC, frac


def test_tier0_verbatim_and_corpus_shape(spark, planted):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(planted, "documents.parquet"))
    truth = spark.read.parquet(
        os.path.join(planted, "planted_pairs.parquet")
    )
    n_base = spark.read.parquet(
        os.path.join(SF_SMALL, "documents.parquet")
    ).count()
    assert docs.count() == 2 * n_base
    a = docs.select(F.col("doc_id").alias("base_id"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("dup_id"), F.col("text").alias("tb"))
    j = truth.join(a, "base_id").join(b, "dup_id")
    # tier 0 is byte-verbatim (no whitespace round-trip); tiers 1-2
    # differ (token drops) for any doc long enough to lose a token
    t0 = j.where("tier = 0")
    assert t0.where("ta <> tb").count() == 0
    t2 = j.where("tier = 2")
    assert t2.where("ta = tb").count() < t2.count()


def test_recall_contracts(spark, planted):
    import scripts.recall_stress as rs

    rec = rs.measure(spark, planted, replicas=2)
    ops = rec["ops"]
    # exact kernels: recall 1.0
    assert ops["dedup_exact"]["tiers"][0]["recall"] == 1.0
    assert ops["embedding_dedup_graph"]["tiers"][0]["recall"] == 1.0
    # identical docs share every band signature: tier-0 minhash = 1.0
    assert ops["dedup_minhash_lsh"]["tiers"][0]["recall"] == 1.0
    assert ops["ngram_jaccard"]["tiers"][0]["recall"] == 1.0
    # pigeonhole band cover is exact: found == eligible on every tier
    for t, v in ops["dedup_simhash"]["tiers"].items():
        assert v["found"] == v["eligible"], (t, v)
    # soundness: found never exceeds eligible anywhere
    for op, r in ops.items():
        for t, v in r["tiers"].items():
            assert v["found"] <= v["eligible"], (op, t, v)
    # scorer completeness: every planted pair gets an exact score row —
    # a NULL-scored pair would silently leave the recall denominator
    # (ADVICE r6), so the harness must report zero unscored pairs here
    for op, r in ops.items():
        assert r.get("unscored_pairs", 0) == 0, (op, r)
