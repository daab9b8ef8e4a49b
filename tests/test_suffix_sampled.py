"""Content-anchored suffix sampling: the ExactSubstr scale mode.

operators/suffix.py's stride mode cuts the suffix-sort input ~stride×
by exploding only positions whose ANCHOR_W-char content window hashes
to 0 mod stride. Because anchors are content-defined, both copies of a
duplicated span sample identical in-span offsets, so sampling loses
RECALL only — soundness is structural (every sampled position's LCP
measures a real duplicate occurrence, and is a lower bound of its
exact max-neighbour LCP). These tests pin both halves of that claim
on the sf0.001 corpus:

  1. subset: sampled span coverage ⊆ exact span coverage, per doc;
  2. recall: sampled coverage keeps >= a floor of exact dup chars
     (measured 0.909 / 0.824 / 0.755 at strides 2 / 4 / 8 — asserted
     with slack, deterministic input, deterministic hash).
"""

from __future__ import annotations

import os

import pytest

from ojo_daps_mirror_spark.plans.llm_plans139 import _merged_spans

RECALL_FLOOR = {2: 0.85, 4: 0.75, 8: 0.65}


def _coverage(spark, sf_dir, stride):
    os.environ["SPARK_GRAFT_SUFFIX_STRIDE"] = str(stride)
    try:
        _, merged = _merged_spans(spark, sf_dir)
        rows = merged.collect()
    finally:
        del os.environ["SPARK_GRAFT_SUFFIX_STRIDE"]
    return {
        r["doc_id"]: {
            c for iv in r["miv"] for c in range(iv["s"], iv["e"])
        }
        for r in rows
    }


@pytest.mark.parametrize("stride", [2, 4, 8])
def test_sampled_spans_sound_and_recall(spark, sf_dir, stride):
    exact = _coverage(spark, sf_dir, 1)
    sampled = _coverage(spark, sf_dir, stride)

    # soundness: no sampled span char outside the exact span set
    for doc_id, chars in sampled.items():
        extra = chars - exact.get(doc_id, set())
        assert not extra, (
            f"stride={stride} doc {doc_id}: {len(extra)} chars flagged "
            "that exact mode does not flag"
        )

    total_exact = sum(len(v) for v in exact.values())
    total_sampled = sum(len(v) for v in sampled.values())
    assert total_exact > 0
    recall = total_sampled / total_exact
    assert recall >= RECALL_FLOOR[stride], (
        f"stride={stride}: recall {recall:.4f} below floor "
        f"{RECALL_FLOOR[stride]}"
    )


def test_auto_stride_heuristic(tmp_path):
    """Auto mode (opt-in via SPARK_GRAFT_SUFFIX_STRIDE=auto) derives
    the stride from estimated sort volume (rows × cap bytes vs the
    exact-mode budget): exact (stride 1) at every local SF, sampled at
    the 64x replica volume where the measured record shows exact-mode
    external-sort thrash. WITHOUT the env var, the default is the
    exact stride 1 regardless of input size — oracle parity must never
    silently depend on corpus volume."""
    from ojo_daps_mirror_spark.operators.suffix import (
        auto_stride,
        resolved_stride,
    )

    assert auto_stride("/root/testdata/sf0.1", 48) == 1
    assert auto_stride("/root/testdata/sf0.01", 48) == 1
    big = tmp_path / "documents.parquet"
    with open(big, "wb") as fh:  # the 64x replica's compressed volume
        fh.truncate(64 * 594_568)
    assert auto_stride(str(tmp_path), 48) >= 4
    # no env, huge corpus: STILL exact — auto is strictly opt-in
    os.environ.pop("SPARK_GRAFT_SUFFIX_STRIDE", None)
    assert resolved_stride(None, str(tmp_path), 48) == 1
    # opting in via env=auto engages the volume heuristic
    os.environ["SPARK_GRAFT_SUFFIX_STRIDE"] = "auto"
    try:
        assert resolved_stride(None, str(tmp_path), 48) >= 4
        assert resolved_stride(None, "/root/testdata/sf0.01", 48) == 1
        # auto with no corpus location degrades to exact
        assert resolved_stride() == 1
    finally:
        del os.environ["SPARK_GRAFT_SUFFIX_STRIDE"]
    # numeric env still forces a value
    os.environ["SPARK_GRAFT_SUFFIX_STRIDE"] = "1"
    try:
        assert resolved_stride(None, str(tmp_path), 48) == 1
    finally:
        del os.environ["SPARK_GRAFT_SUFFIX_STRIDE"]
    # explicit arg beats everything
    assert resolved_stride(3, str(tmp_path), 48) == 3


def test_stride_resolution_and_validation():
    from ojo_daps_mirror_spark.operators.suffix import resolved_stride

    assert resolved_stride(3) == 3
    os.environ["SPARK_GRAFT_SUFFIX_STRIDE"] = "5"
    try:
        assert resolved_stride() == 5
    finally:
        del os.environ["SPARK_GRAFT_SUFFIX_STRIDE"]
    assert resolved_stride() == 1
    with pytest.raises(ValueError):
        resolved_stride(0)
