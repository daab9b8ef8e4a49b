"""Tolerance tests for the SPARK_GRAFT_SCALE_MODE=approx swaps.

Every call site that documents "swap to the sketch at 100 TB" now
flips under the one session switch (scale_mode.py). These tests prove
each swapped query stays within tolerance of its exact twin at the
LARGEST local SF (sf0.1 by default — override with
SPARK_GRAFT_SCALE_SF), per family:

- percentile → percentile_approx: rank error ≤ 1/accuracy, so value
  error is bounded by the local density of the distribution; we
  assert a per-column relative tolerance.
- count_distinct → HLL (approx_count_distinct, rsd 1 %): relative
  error ≤ 5 % (5 σ of the declared rsd).
- NTILE / percent_rank / range boundaries → approx cut points:
  bucket-assignment agreement and bucket-size balance, since exact
  NTILE splits value ties by a tie-break order the sketch form cannot
  see.

Default mode is exact, so the driver's oracle parity is untouched —
tests/test_duckdb_parity.py and the driver gate keep running the
exact forms. This module is the A37-recipe generalised: the approx
form is validated against the exact form, not against the oracle.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_SCALE = os.environ.get("SPARK_GRAFT_SCALE_SF", "/root/testdata/sf0.1")

# (join_keys, {column: rule}) — rule is "exact", ("rel", x) or
# ("abs", x); columns not listed must match exactly.
REL = "rel"
ABS = "abs"
SPECS: dict[str, tuple[list[str], dict[str, tuple]]] = {
    # --- percentile → percentile_approx ---
    "weekly_salary_spread": (
        ["week"],
        {c: (REL, 0.05) for c in (
            "min_lower_q", "min_median", "min_upper_q",
            "max_lower_q", "max_median", "max_upper_q",
        )},
    ),
    "skill_salary_spread": (
        ["skill_group"],
        {"lower_q": (REL, 0.05), "median": (REL, 0.05), "upper_q": (REL, 0.05)},
    ),
    "chars_equidepth_histogram": (
        [],  # positional: 4 fixed buckets
        {"n_docs": (REL, 0.10), "lo": (REL, 0.10), "hi": (REL, 0.10)},
    ),
    "conversion_latency_quantiles": (
        [],
        {"p25_hours": (REL, 0.05), "p50_hours": (REL, 0.05),
         "p75_hours": (REL, 0.05), "p95_hours": (REL, 0.10)},
    ),
    "corpus_stats": (["source"], {"median_chars": (REL, 0.05)}),
    "robust_scaling": (
        ["seg"],
        {"median": (REL, 0.05), "iqr": (REL, 0.05),
         "n_outliers": (REL, 0.15)},
    ),
    "mad_outliers": (
        ["event_type"],
        {"median_value": (REL, 0.05), "mad": (REL, 0.05),
         "n_outliers": (REL, 0.15)},
    ),
    "winsorized_stats": (
        ["grp"],
        {"winsorized_mean": (REL, 0.05), "plain_mean": "exact"},
    ),
    "dwell_time_by_type": (
        ["event_type"], {"median_dwell_s": (REL, 0.05)},
    ),
    "join_skew_report": (["join_key"], {"p99_cnt": (REL, 0.10)}),
    "hodges_lehmann": ([], {"hl": (REL, 0.05), "med": (REL, 0.05)}),
    "ccnet_perplexity_buckets": (
        ["bucket"], {"n_docs": (REL, 0.05), "avg_ce": (REL, 0.02)},
    ),
    # --- count_distinct → HLL ---
    "data_profile_report": (["col_name"], {"n_distinct": (REL, 0.05)}),
    "rolling_distinct_users": (["day"], {"rolling_users": (REL, 0.05)}),
    # --- NTILE / percent_rank / range boundaries → cut points ---
    "lift_table": (
        ["decile"],
        {"n": (REL, 0.20), "conversions": (REL, 0.20),
         "rate": (ABS, 0.15), "cum_capture": (ABS, 0.05)},
    ),
    "range_partition_plan": (
        ["bucket"],
        {"n_rows": (REL, 0.10), "min_price": (REL, 0.10),
         "max_price": (REL, 0.10), "balance_ratio": (ABS, 0.10)},
    ),
    # quality_percentile_blend / rfm_features use bespoke checks below.
}


@pytest.fixture(scope="module")
def runner(spark):
    from ojo_daps_mirror_spark import plans

    plans.load_all()

    def run(key: str, approx: bool) -> pd.DataFrame:
        old = os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        try:
            if approx:
                os.environ["SPARK_GRAFT_SCALE_MODE"] = "approx"
            return plans.QUERIES[key](spark, SF_SCALE).toPandas()
        finally:
            os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
            if old is not None:
                os.environ["SPARK_GRAFT_SCALE_MODE"] = old

    return run


def _check(key: str, ex: pd.DataFrame, ap: pd.DataFrame) -> None:
    join_keys, rules = SPECS[key]
    assert len(ex) == len(ap), f"{key}: row count {len(ex)} vs {len(ap)}"
    if join_keys:
        m = ex.merge(ap, on=join_keys, suffixes=("_e", "_a"))
        assert len(m) == len(ex), f"{key}: join keys disagree"
    else:
        ex = ex.reset_index(drop=True)
        ap = ap.reset_index(drop=True)
        m = ex.add_suffix("_e").join(ap.add_suffix("_a"))
    for col in ex.columns:
        if col in join_keys:
            continue
        e, a = m[f"{col}_e"], m[f"{col}_a"]
        rule = rules.get(col, "exact")
        if rule == "exact":
            assert e.astype(str).equals(a.astype(str)), (
                f"{key}.{col}: exact column drifted under approx mode"
            )
            continue
        kind, tol = rule
        e = e.astype(float)
        a = a.astype(float)
        if kind == ABS:
            err = (e - a).abs().max()
            assert err <= tol, f"{key}.{col}: abs err {err} > {tol}"
        else:
            denom = e.abs().clip(lower=1e-9)
            err = ((e - a).abs() / denom).max()
            assert err <= tol, f"{key}.{col}: rel err {err} > {tol}"


@pytest.mark.parametrize("key", sorted(SPECS))
def test_approx_within_tolerance(runner, key):
    _check(key, runner(key, approx=False), runner(key, approx=True))


def test_quality_percentile_blend_rank_error(runner):
    """CDF-swap contract, stated exactly: for a doc with signal value
    v, the exact percent-rank lies anywhere in v's tie-run band
    [minrank(v), maxrank(v)]/(n-1) (the window breaks ties by doc_id);
    the approx rank is pinned near the band's floor (#values < v)
    within 1/cuts + sketch epsilon. So the approx BLEND must sit
    inside the weighted tie-band, expanded by that epsilon — a bound
    that holds at any SF, unlike a flat max-error number."""
    from ojo_daps_mirror_spark.plans.llm_plans5 import BLEND_W_LEN, BLEND_W_STOP
    from ojo_daps_mirror_spark.scale_mode import CDF_CUTS

    ex = runner("quality_percentile_blend", approx=False)
    ap = runner("quality_percentile_blend", approx=True)
    m = ex.merge(
        ap[["doc_id", "quality_blend"]].rename(
            columns={"quality_blend": "blend_a"}
        ),
        on="doc_id",
    )
    assert len(m) == len(ex)
    n = len(m)

    def band(vals: pd.Series) -> tuple[pd.Series, pd.Series]:
        lo = (vals.rank(method="min") - 1) / (n - 1)
        hi = (vals.rank(method="max") - 1) / (n - 1)
        return lo, hi

    lo_len, hi_len = band(m["n_tokens"])
    lo_stop, hi_stop = band(m["stop_ratio"])
    blend_lo = BLEND_W_LEN * lo_len + BLEND_W_STOP * lo_stop
    blend_hi = BLEND_W_LEN * hi_len + BLEND_W_STOP * hi_stop
    eps = 2 * (1.0 / CDF_CUTS) + 2e-3  # per-signal cut + sketch slack
    inside = (m["blend_a"] >= blend_lo - eps) & (m["blend_a"] <= blend_hi + eps)
    assert inside.all(), (
        f"{(~inside).sum()}/{n} docs outside the exact tie-band ± {eps}"
    )
    # sanity on the bulk: outside tie runs the two forms coincide.
    # Loose on purpose — percentile_approx's per-partition summaries
    # merge in scheduling order, so the cut points wobble a few 1e-3
    # run-to-run; the band assertion above is the binding contract.
    err = (m["quality_blend"] - m["blend_a"]).abs()
    assert err.median() <= 0.02, f"median blend error {err.median()}"


def test_rfm_features_bucket_agreement(runner):
    """NTILE swap contract: cut-point quintiles agree with exact NTILE
    except inside value ties / boundary epsilon — never off by more
    than one bucket, mostly identical."""
    ex = runner("rfm_features", approx=False)
    ap = runner("rfm_features", approx=True)
    m = ex.merge(ap, on="user_id", suffixes=("_e", "_a"))
    assert len(m) == len(ex)
    n = len(m)
    for col in ("r_score", "f_score", "m_score"):
        diff = (m[f"{col}_e"] - m[f"{col}_a"]).abs()
        agree = (diff == 0).mean()
        # recency_days and frequency are integer-valued (heavy
        # ties): exact NTILE splits tie runs by user_id, the cut form
        # cannot — so their agreement floors are looser than the
        # ~continuous monetary score's (measured 0.58 / 0.72 / 0.97
        # at sf0.1, where a single tie run spans quintile boundaries)
        floor = {"r_score": 0.50, "f_score": 0.60, "m_score": 0.85}[col]
        assert agree >= floor, f"{col}: agreement {agree:.3f} < {floor}"
        assert (diff <= 1).mean() >= 0.95, (
            f"{col}: {(diff > 1).sum()}/{n} rows off by >1 bucket"
        )
    # bucket sizes stay near-balanced under the cut form
    for col in ("f_score", "m_score"):
        sizes = ap[col].value_counts()
        assert sizes.max() <= 1.5 * n / 5, f"{col}: bucket blowup {sizes.max()}"


def test_scale_mode_validation():
    from ojo_daps_mirror_spark import scale_mode as sm

    old = os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
    try:
        assert sm.scale_mode() == "exact"
        os.environ["SPARK_GRAFT_SCALE_MODE"] = "approx"
        assert sm.is_approx()
        os.environ["SPARK_GRAFT_SCALE_MODE"] = "bogus"
        with pytest.raises(ValueError):
            sm.scale_mode()
    finally:
        os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        if old is not None:
            os.environ["SPARK_GRAFT_SCALE_MODE"] = old


def test_data_profile_all_null_column_keeps_row(spark, tmp_path):
    """Regression (r5 advice): the approx path's HLL frame has no row
    for a column whose values are ALL NULL (no non-null stream), and
    an inner join silently dropped that column's profile aggregate.
    With the left join + coalesce the aggregate survives with
    n_distinct=0 in approx mode, identical to exact mode. (Both modes
    then drop the column at the mode-pick join, matching the oracle's
    shape — the invariant under test is the aggregate frame.)"""
    from ojo_daps_mirror_spark.plans import llm_plans19

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    nulled = src.limit(200).withColumn(
        "o_orderpriority",
        F.lit(None).cast("string"),
    )
    nulled.write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )

    def agg_rows(approx: bool) -> dict:
        old = os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        try:
            if approx:
                os.environ["SPARK_GRAFT_SCALE_MODE"] = "approx"
            # reach the aggregate frame via the public query, minus the
            # mode-pick join: recompute the same unpivot + agg inline
            df = llm_plans19.data_profile_report(spark, str(tmp_path))
            return {r["col_name"]: r.asDict() for r in df.collect()}
        finally:
            os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
            if old is not None:
                os.environ["SPARK_GRAFT_SCALE_MODE"] = old

    ex, ap = agg_rows(False), agg_rows(True)
    # the all-null column is absent from BOTH (mode-pick join, oracle
    # shape) — the surviving columns must agree between the modes and
    # the approx path must not error or mis-shape
    assert set(ex) == set(ap) == {"o_orderstatus", "o_custkey"}
    for c in ex:
        assert ex[c]["n_rows"] == ap[c]["n_rows"] == 200
        assert ex[c]["n_null"] == ap[c]["n_null"] == 0

    # and the aggregate frame itself (pre mode-pick) keeps the all-null
    # column with n_distinct=0 under approx — the advice's exact claim
    from ojo_daps_mirror_spark import scale_mode as sm
    from ojo_daps_mirror_spark.plans.llm_plans19 import _PROFILE_COLS

    old = os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
    os.environ["SPARK_GRAFT_SCALE_MODE"] = "approx"
    try:
        orders = spark.read.parquet(str(tmp_path / "orders.parquet"))
        stack_expr = ", ".join(
            f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
        )
        vals = orders.selectExpr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS (c, v)"
        )
        agg = vals.groupBy("c").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias(
                "n_null"
            ),
        )
        dis = (
            vals.where(F.col("v").isNotNull())
            .groupBy("c")
            .agg(sm.count_distinct("v").alias("n_distinct"))
        )
        joined = (
            agg.join(F.broadcast(dis), "c", "left")
            .withColumn(
                "n_distinct",
                F.coalesce("n_distinct", F.lit(0)).cast("bigint"),
            )
            .collect()
        )
        rows = {r["c"]: r for r in joined}
        assert rows["o_orderpriority"]["n_distinct"] == 0
        assert rows["o_orderpriority"]["n_null"] == 200
        assert rows["o_orderstatus"]["n_distinct"] > 0
    finally:
        os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        if old is not None:
            os.environ["SPARK_GRAFT_SCALE_MODE"] = old
