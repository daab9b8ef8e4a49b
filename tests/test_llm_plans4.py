"""Semantic + plan tests for the C36–C41 / B38 operators."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.plans.llm_plans4 import (
    BLOOM_BENCH_MOD,
    LINE_MIN_TOKENS,
    POSTINGS_CAP,
    SAMPLE_PER_GROUP,
)
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def _plan(spark, sf_dir, key):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.QUERIES[key](spark, sf_dir).explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- C36


def test_line_filter_kept_lines_have_stopwords(spark, sf_dir):
    out = plans.QUERIES["line_quality_filter"](spark, sf_dir)
    rows = out.collect()
    assert rows
    from ojo_daps_mirror_spark.functions.text import STOPWORDS

    stop = set(STOPWORDS)
    for r in rows[:50]:
        assert 1 <= r.n_kept <= r.n_lines
        # every reassembled doc retains at least one stopword per 10-token line
        toks = r.text_clean.split()
        assert any(t in stop for t in toks)


def test_line_filter_no_python_udf(spark, sf_dir):
    plan = _plan(spark, sf_dir, "line_quality_filter")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- C37


def test_inverted_index_postings_sorted_and_capped(spark, sf_dir):
    rows = plans.QUERIES["inverted_index"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",") if x]
        assert ids == sorted(ids)
        assert len(ids) <= POSTINGS_CAP
        assert len(ids) <= r.doc_freq


def test_inverted_index_df_counts_docs_once(spark, sf_dir):
    """A term repeated inside one doc still counts that doc once."""
    rows = plans.QUERIES["inverted_index"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert all(r.doc_freq <= n_docs for r in rows)


# ---------------------------------------------------------------- C38


def test_group_sample_exact_sizes(spark, sf_dir):
    out = plans.QUERIES["group_sample_fixed"](spark, sf_dir)
    sizes = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in sizes.items():
        assert n == min(SAMPLE_PER_GROUP, full[lang])


# ---------------------------------------------------------------- C39


def test_bloom_superset_of_exact_decontamination(spark, sf_dir):
    """Bloom positives must include every TRUE n-gram contamination
    (no false negatives — the Bloom guarantee); extra docs, if any,
    are false positives."""
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in plans.QUERIES["bloom_decontaminate"](spark, sf_dir).collect()
    }
    exact = {
        r.doc_id: r.n_hit_shingles
        for r in plans.QUERIES["decontaminate_ngram"](spark, sf_dir).collect()
    }
    assert set(exact) <= set(bloom)
    for doc_id, n_true in exact.items():
        assert bloom[doc_id] >= n_true


def test_bloom_filter_is_broadcast_and_bounded(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bloom_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the filter itself never exceeds BLOOM_WORDS rows
    from ojo_daps_mirror_spark.plans.llm_plans4 import BLOOM_WORDS
    from ojo_daps_mirror_spark.functions.text import shingles, tokens
    from ojo_daps_mirror_spark.plans.llm_plans4 import (
        BLOOM_SHINGLE_K,
        _bloom_pos,
        BLOOM_K,
    )

    from ojo_daps_mirror_spark.functions.text import hash64

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.where(F.col("doc_id") % BLOOM_BENCH_MOD == 0)
        .select(F.explode(shingles(tokens(F.col("text")), BLOOM_SHINGLE_K)).alias("s"))
        .distinct()
        .select(hash64(F.col("s")).alias("h"))
    )
    n_words = (
        bench.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("h"), i) for i in range(BLOOM_K)])
            ).alias("pos")
        )
        .select((F.col("pos") / 32).cast("bigint").alias("w"))
        .distinct()
        .count()
    )
    assert n_words <= BLOOM_WORDS


# ---------------------------------------------------------------- B38


def test_histogram_bins_partition_the_orders(spark, sf_dir):
    rows = plans.QUERIES["order_price_histogram"](spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.min_price <= r.mean_price <= r.max_price


def test_histogram_is_single_agg_no_shuffle_heavy_ops(spark, sf_dir):
    plan = _plan(spark, sf_dir, "order_price_histogram")
    assert "Window" not in plan
    # formatted mode lists each node twice (tree + detail); count nodes
    assert plan.count(") Exchange") <= 2  # partial->final agg + output order


# ---------------------------------------------------------------- C40/C41


def test_sliding_counts_each_event_in_four_windows(spark, sf_dir):
    rows = plans.QUERIES["streaming_sliding_counts"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == 4 * n_events


def test_static_enrich_totals_match_batch_join(spark, sf_dir):
    rows = plans.QUERIES["streaming_static_enrich"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer")
    batch = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    batch_n = {r.c_mktsegment: r.n for r in batch}
    assert {r.c_mktsegment: r.n_purchases for r in rows} == batch_n
