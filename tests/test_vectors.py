"""ANN: the approximate path must actually approximate the exact one."""

from __future__ import annotations

from ojo_daps_mirror_spark import plans

plans.load_all()


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = plans.QUERIES["ann_topk_bruteforce"](spark, sf_dir).collect()
    approx = plans.QUERIES["ann_lsh_bucketed"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx_sets) == set(exact_sets)  # every query answered
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # near-orthogonal random vectors are LSH's worst case; the bar is
    # "clearly better than chance", not production recall
    assert mean_recall >= 0.4, f"mean recall {mean_recall:.2f}"


def test_lsh_cosines_are_exact_for_returned_pairs(spark, sf_dir):
    # whatever pairs LSH returns, their cosine must equal the exact one
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in plans.QUERIES["ann_topk_bruteforce"](spark, sf_dir).collect()
    }
    for r in plans.QUERIES["ann_lsh_bucketed"](spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cos_sim"]) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = plans.QUERIES["ann_topk_bruteforce"](spark, sf_dir).collect()
    approx = plans.QUERIES["ann_ivf"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=2 of 16 cells over near-orthogonal vectors: the bar is
    # "clearly better than chance" (2/16 of the corpus scanned)
    assert mean_recall >= 0.3, f"mean recall {mean_recall:.2f}"


def test_ivf_cosines_are_exact_for_returned_pairs(spark, sf_dir):
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in plans.QUERIES["ann_topk_bruteforce"](spark, sf_dir).collect()
    }
    for r in plans.QUERIES["ann_ivf"](spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cos_sim"]) < 1e-9
