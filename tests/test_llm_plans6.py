"""Semantic + plan tests for the C45–C48 operators."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.plans.llm_plans6 import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PROBE_MOD,
    PROBE_REM,
)
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def _plan(spark, sf_dir, key):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES[key](spark, sf_dir).explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- C45


def test_bpe_pairs_are_char_bigrams_counted_on_vocab(spark, sf_dir):
    rows = plans.QUERIES["bpe_pair_counts"](spark, sf_dir).collect()
    assert rows
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        a, b = r.pair.split(" ")
        assert len(a) == 1 and len(b) == 1  # first merge round: chars


def test_bpe_pair_count_matches_manual(spark, sf_dir):
    """Recompute the top pair's count by brute force on the driver."""
    rows = plans.QUERIES["bpe_pair_counts"](spark, sf_dir).collect()
    top = rows[0]
    a, b = top.pair.split(" ")
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    manual = 0
    for r in docs:
        for w in r.text.split():
            manual += sum(
                1 for i in range(len(w) - 1) if w[i] == a and w[i + 1] == b
            )
    assert manual == top.pair_count


# ---------------------------------------------------------------- C46


def test_rag_chunks_cover_and_overlap(spark, sf_dir):
    out = plans.QUERIES["rag_chunking"](spark, sf_dir)
    rows = out.collect()
    docs = {
        r.doc_id: r.text.split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in list(by_doc.items())[:30]:
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk j starts at stride*j and reproduces the token slice
        for r in chunks:
            assert r.start_tok == 1 + CHUNK_STRIDE * r.chunk_id
            expect = toks[r.start_tok - 1 : r.start_tok - 1 + CHUNK_SIZE]
            assert r.chunk_text.split() == expect
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last.start_tok - 1 + last.n_tok == len(toks)


def test_rag_chunking_is_map_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rag_chunking")
    # only the presentation sort exchanges; no aggregation, no join
    assert ") HashAggregate" not in plan and ") SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- C47


def test_incremental_probe_pairs_new_vs_index_only(spark, sf_dir):
    rows = plans.QUERIES["incremental_minhash_dedup"](spark, sf_dir).collect()
    for r in rows:
        assert r.id_a % PROBE_MOD == PROBE_REM
        assert r.id_b % PROBE_MOD != PROBE_REM
        assert r.jaccard >= 0.5


def test_incremental_probe_is_subset_of_full_dedup(spark, sf_dir):
    """Every (new, index) pair the batch probe reports must also exist
    in the full-corpus C5 self-dedup (same signatures, same verify)."""
    inc = {
        (r.id_a, r.id_b)
        for r in plans.QUERIES["incremental_minhash_dedup"](spark, sf_dir).collect()
    }
    full = set()
    for r in plans.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect():
        full.add((r.id_a, r.id_b))
        full.add((r.id_b, r.id_a))
    # At test SFs no bucket hits C5's cap, so the probe's pairs are
    # exactly the full dedup's pairs restricted to (new, index).
    assert inc <= full
    # and every reported pair truly clears the exact-Jaccard threshold
    from ojo_daps_mirror_spark.functions.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    sample = list(inc)[:5]
    if sample:
        ids = {i for p in sample for i in p}
        sh = {
            r.doc_id: set(r.sh)
            for r in docs.where(F.col("doc_id").isin(*ids))
            .select("doc_id", shingles(tokens(F.col("text")), 3).alias("sh"))
            .collect()
        }
        for a, b in sample:
            jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            assert jac >= 0.5


def test_incremental_probe_broadcasts_batch_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "incremental_minhash_dedup")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- C48


def test_cluster_stats_match_numpy(spark, sf_dir):
    import numpy as np

    rows = plans.QUERIES["embedding_cluster_stats"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)
    assert {r.label for r in rows} == set(by_label)
    for r in rows:
        M = np.array(by_label[r.label], dtype=np.float64)
        c = M.mean(axis=0)
        assert r.n_vecs == len(M)
        assert abs(r.centroid_norm - np.linalg.norm(c)) < 1e-3
        msd = ((M - c) ** 2).sum(axis=1).mean()
        assert abs(r.mean_sq_dist - msd) < 1e-3
