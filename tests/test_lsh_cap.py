"""Hot-bucket skew guard for MinHash-LSH (MH_BUCKET_CAP).

A degenerate boilerplate corpus — hundreds of identical docs — collides
into ONE band bucket whose pair expansion is O(n²) inside a single task.
The cap must drop such buckets (bounding candidate count) while leaving
ordinary near-dup pairs intact.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def boiler_sf_dir(spark, tmp_path_factory) -> str:
    from ojo_daps_mirror_spark.plans.text_plans import MH_BUCKET_CAP

    n_boiler = MH_BUCKET_CAP + 100
    boiler = "terms and conditions apply please read the full policy document"
    rows = [(i, boiler, "en") for i in range(n_boiler)]
    # Two genuine near-dup pairs of non-boilerplate text.
    a = "data engineer needed to build spark pipelines for analytics team"
    rows += [(10_000, a, "en"), (10_001, a + " in london", "en")]
    b = "senior rust developer wanted for distributed storage systems work"
    rows += [(10_002, b, "en"), (10_003, b + " remote ok", "en")]
    d = str(tmp_path_factory.mktemp("boiler"))
    spark.createDataFrame(rows, "doc_id bigint, text string, lang string").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_bucket_cap_bounds_candidates(spark, boiler_sf_dir):
    from ojo_daps_mirror_spark.plans.text_plans import (
        MH_BUCKET_CAP,
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, boiler_sf_dir).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # The real near-dup pairs survive the cap.
    assert (10_000, 10_001) in got
    assert (10_002, 10_003) in got
    # The 300-doc boilerplate cluster would contribute ~n²/2 ≈ 45k pairs
    # without the cap; with it, its bucket is dropped entirely.
    assert len(pairs) < MH_BUCKET_CAP


def test_pipeline_inherits_cap(spark, boiler_sf_dir):
    """text_dedup_pipeline composes on the capped candidate generator and
    must still produce a row per doc without quadratic edge blow-up."""
    from ojo_daps_mirror_spark.plans.text_plans import text_dedup_pipeline

    out = text_dedup_pipeline(spark, boiler_sf_dir)
    rows = out.collect()
    comp = {r.doc_id: r.component_id for r in rows}
    assert comp[10_001] == comp[10_000] == 10_000
    assert comp[10_003] == comp[10_002] == 10_002
