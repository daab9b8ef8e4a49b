"""Global physical-plan guardrails over EVERY registered query.

The per-operator plan audits (test_plans.py etc.) assert specific
optimizations; this sweep asserts the engine-wide invariants:

- no row-at-a-time Python (BatchEvalPython) anywhere — Python only
  enters via Arrow-batched kernels, and only in the operators that
  genuinely need numpy (ANN / simhash / windowed near-dup families);
- no CartesianProduct, ever;
- BroadcastNestedLoopJoin only where it is the DESIGN: broadcast
  scalar/tiny-dim attaches (weekly index frames, window dims, global
  thresholds) and the declared-exact brute-force ANN baseline.

A new operator that accidentally introduces a Python UDF or an
unconstrained join fails this sweep by default — additions to the
allowlists must be argued in the diff.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from ojo_daps_mirror_spark import plans

plans.load_all()

# Arrow-batched Python kernels: the numpy escape hatches only.
ARROW_OK = {
    "ann_topk_blocked",
    "knn_label_eval",
    "contrastive_pair_mining",
    "rag_chunking_udtf",  # arrow-optimized UDTF by design (API-surface twin of C46)
    "ann_ivf",
    "ann_lsh_bucketed",
    "ann_pq_adc",
    "dedup_simhash",
    "embedding_dedup_graph",
    "multimodal_decode",
    "media_dedup_phash",  # fingerprint kernel over the binary column (pHash slot)
    "near_dup_adaptive",
    "near_dup_cosine",
    "near_dup_windowed",
    "pq_encode",
    "semdedup",
    "text_dedup_pipeline",
    "vectorise_stub",
    "matryoshka_recall",  # streaming-BLAS prefix-dim top-k kernel (C53's shape)
    "dedup_method_agreement",  # composes C6's Arrow simhash signature kernel
}

# BroadcastNestedLoopJoin: broadcast scalar / tiny-dim attaches with
# range or true predicates, plus the declared brute-force ANN baseline.
BNLJ_OK = {
    "ann_topk_bruteforce",  # exact all-pairs baseline BY DESIGN
    "theil_decomposition",  # broadcast 1-row totals attach to |groups| rows
    "rmst_summary",  # broadcast 1-row head-segment attach to 1-row tail
    "weighted_jaccard_dedup",  # broadcast 1-row corpus-size attach
    "kruskal_wallis",  # broadcast 1-row tie-correction attach to 1-row stats
    "lang_label_noise",  # broadcast 1-row corpus-total attach to 1-row stats
    "dormant_rich_customers",  # broadcast scalar avg-balance threshold
    "important_part_value",  # broadcast scalar share threshold
    "near_dup_adaptive",  # broadcast window dim, range condition
    "near_dup_windowed",  # broadcast window dim, range condition
    "remove_frequent_forms",  # broadcast scalar p95 threshold
    "soc_substring_match",  # broadcast lexicon, substring predicate
    "tfidf_top_terms",  # broadcast scalar doc count
    "timeseries_gap_fill",  # broadcast 2-scalar calendar bounds
    "weekly_locs_vacancies",  # broadcast Monday index frame
    "weekly_soc_vacancies",  # broadcast Monday index frame
    "weekly_stock",  # broadcast Monday index frame
    "incremental_stock_refresh",  # same fill_and_index broadcast index attach
    "weekly_stock_by_region",  # broadcast Monday index frame
    "incremental_minhash_dedup",  # broadcast pair frame in verify
    "dedup_minhash_lsh",  # broadcast pair frame in verify
    "ngram_jaccard",  # broadcast pair frame in verify
    "user_behavior_similarity",  # broadcast pair frame in verify
    "hybrid_search_rrf",  # broadcast 1-row df-count + query-vector attaches
    "rolling_distinct_users",  # broadcast 1-row calendar-bounds attach
    "rfm_features",  # broadcast 1-row horizon-scalar attach
    "item_cooccurrence",  # broadcast 1-row |orders|-scalar attach
    "chars_equidepth_histogram",  # broadcast 1-row percentile-cuts attach
    "kneser_ney_bigram",  # broadcast 1-row |bigram types|-scalar attach
    "sequence_mining_2seq",  # broadcast 1-row |users|-scalar attach
    "cuped_adjusted_ab",  # broadcast 1-row theta/xbar-scalar attach
    "lift_table",  # broadcast 1-row total-conversions attach
    "ccnet_perplexity_buckets",  # broadcast 1-row LM-total + tercile-cuts attaches
    "kmeans_lloyd",  # broadcast K-row codebook attach per Lloyd round
    "bootstrap_ci_mean",  # broadcast 1-row CI-quantile attach
    "bm25_ranking",  # broadcast 1-row corpus-stats attach
    "theil_sen_trend",  # broadcast 1-row slope frame onto the |weeks| dim
    "acf_weekly_volume",  # banded self-join of the |weeks| dim (range cond)
    "exact_median_two_pass",  # 2-row order-statistic positions × |buckets| hist
    "centroid_silhouette",  # broadcast |labels|-row centroid table attach
    "seasonal_anomaly_flags",  # broadcast 1-row residual-stats attach
    "source_kl_divergence",  # broadcast 1-row corpus-total/vocab attach
    "markov_attribution",  # broadcast variant-literal + 1-row base-prob attach
    "cohort_ltv_curve",  # broadcast 1-row horizon-scalar attach
    "join_cardinality_probe",  # broadcast 1-row actual-count audit attach
    "mmr_diverse_topk",  # broadcast 1-row query-vector attach
    "negative_sampling_table",  # broadcast 1-row weight-total attach
    "ndcg_eval",  # declared all-pairs eval harness (C8's contract)
    "backfill_plan",  # broadcast 1-row p25-threshold attach
    "abc_classification",  # broadcast 1-row revenue-total attach
    "index_shard_plan",  # broadcast 1-row point-total attach
    "calibration_reliability",  # broadcast 1-row Brier-total attach
    "sequence_mining_3seq",  # broadcast 1-row user-total attach
    "psi_drift",  # broadcast base-histogram + 1-row corpus-total attaches
    "roc_auc_points",  # broadcast 1-row rank-sum-totals attach
    "quantile_normalization",  # broadcast 1-row global-N attach
    "fdr_bh_correction",  # broadcast 1-row global-proportion attach
    "ctfidf_cluster_terms",  # broadcast 1-row avg-class-size attach
    "hodges_lehmann",  # banded |weeks|-dim self-join (wa<=wb) + 1-row attach
    "xcorr_lead_lag",  # broadcast 9-row lag-dim attach onto the |days| frame
    "relational_division",  # broadcast 1-row divisor-count attach
    "hilbert_key",  # 4-adjacency self-join of the bounded (≤4096) cell dim
    "range_partition_plan",  # broadcast 1-row boundary-array attach
    "degree_assortativity",  # broadcast 1-row edge-threshold attach
    "cohens_kappa",  # broadcast 1-row expected-agreement attach
    "top_with_other_rollup",  # broadcast 1-row revenue-total attach
    "kfold_cv_variance",  # broadcast 1-row global-sufficient-stats attach
    "simpson_paradox_audit",  # broadcast 1-row pooled-sufficient-stats attach
    "journey_entropy_rate",  # broadcast 1-row transition-total attach
    "rank_overlap_rbo",  # broadcast 10-row depth-grid attach per source
    "ql_dirichlet_ranking",  # broadcast 3-row query-dim + 1-row corpus attach
    "little_law_audit",  # broadcast 1-row occupancy-integral attach to 1-row stats
    "kendall_tau_b",  # broadcast 1-row tie-term attaches to 1-row stats
    "mann_kendall_trend",  # banded |weeks|-dim self-join + 1-row attaches
    "holdout_bigram_ppl",  # broadcast 1-row vocab-size attach (bm25's pattern)
    "kmv_distinct_sketch",  # broadcast 1-row exact-count audit attach to 3 rows
    "friedman_test",  # broadcast 1-row tie-term attach to 1-row stats
    "spc_control_chart",  # broadcast 1-row control-limits attach to |weeks|
    "abc_xyz_matrix",  # broadcast 1-row week-span scalar attach to |parts|
    "tukey_hsd",  # 5-row group-dim self-join (10 pairs) + 1-row MSW attach
    "kupiec_pof_test",  # broadcast 1-row train-VaR attach onto the eval frame
    "cramers_v_matrix",  # broadcast 1-row cardinality attach per pair (3 rows)
    "lsh_candidate_precision",  # broadcast pair frame in verify (C5's shape)
    "split_leakage_audit",  # composes C5's verify (broadcast pair frame)
    "lexical_semantic_agreement",  # declared all-pairs eval harness (C8's contract)
    "kendall_w_concordance",  # broadcast 1-row tie-term attach to 1-row stats
    "chain_ladder",  # broadcast <=6-row dev-factor dim, range condition
    "dup_cluster_lang_purity",  # composes C5's verify (broadcast pair frame)
    "exemplar_quality_bias",  # composes C5's verify (broadcast pair frame)
    "retrieval_mrr",  # declared all-pairs eval harness (C8's contract)
    "meta_fixed_effect",  # broadcast 1-row pooled-effect attach for Q
    "ab_power_planning",  # |lifts|-row grid built from a 1-row baseline
    "burrows_delta",  # |sources| x |terms| zero-fill dimension cross
    "jelinek_mercer_em_step",  # broadcast 1-row totals + EM-stats attaches
    "char_ngram_langid",  # broadcast |langs|-dim + 1-row vocab attaches
    "acceptance_sampling_oc",  # |plans|x|rates| grid built from a 1-row base
    "near_dup_source_matrix",  # composes C5's verify (broadcast pair frame)
    "intrinsic_dim_mle",  # declared all-pairs eval harness (C8's contract)
    "dedup_method_agreement",  # composes C5's verify (broadcast pair frame)
    "dedup_mixture_shift",  # composes C5's verify (broadcast pair frame)
    # --- bounded pair expansions, argued individually (round 3) ---
    # |weeks|-dim all-pairs / banded self-joins: the frame entering the
    # join is the weekly aggregate (|weeks| ~ 1e2-1e3 at any corpus
    # size — time, not data, bounds it), same family as the allowlisted
    # hodges_lehmann / theil_sen_trend / mann_kendall_trend.
    "sen_slope_ci",  # |weeks|-dim all-pairs slope grid + rank-CI pick
    "siegel_repeated_medians",  # |weeks|-dim all-pairs slope grid
    "hoeffdings_d",  # |weeks|-dim all-pairs concordance scan
    "pacf_durbin_levinson",  # banded |weeks|-dim self-join (acf's shape)
    "max_consensus_line",  # |weeks|-dim candidate x point residual grid
    # |sources|-dim pair grids: the join is over the distinct-source
    # frame (single digits of rows), same family as burrows_delta.
    "vocab_overlap_matrix",  # |sources|-dim pair grid zero-fill
    "minhash_jaccard_vs_exact",  # |sources|-dim pair grid (est vs exact)
    # Declared exact all-pairs baselines over the embeddings table,
    # same contract as ann_topk_bruteforce (C8): the quadratic scan IS
    # the audited ground truth; the scale path is the bucketed C9/C15.
    "hubness_audit",  # exact k-occurrence needs the true top-k graph
    "neardup_transitivity_audit",  # exact threshold edge set
    "onebit_retrieval_agreement",  # exact cosine + Hamming top-k twins
}

BATCH_KEYS = sorted(k for k in plans.QUERIES if not k.startswith("streaming"))


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    out = {}
    for key in BATCH_KEYS:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plans.QUERIES[key](spark, sf_dir).explain("formatted")
        out[key] = buf.getvalue()
    return out


def test_no_row_at_a_time_python_anywhere(all_plans):
    offenders = [k for k, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [k for k, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_arrow_python_only_in_numpy_operators(all_plans):
    offenders = [
        k
        for k, p in all_plans.items()
        if "ArrowEvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p
    ]
    unexpected = set(offenders) - ARROW_OK
    assert not unexpected, sorted(unexpected)


def test_bnlj_only_where_designed(all_plans):
    offenders = [
        k for k, p in all_plans.items() if ") BroadcastNestedLoopJoin" in p
    ]
    unexpected = set(offenders) - BNLJ_OK
    assert not unexpected, sorted(unexpected)
