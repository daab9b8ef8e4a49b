"""Invariants of the range-partitioned rank operator (operators/rank.py).

The operator's correctness rests on both plan branches reading the
SAME materialized range exchange (ReuseExchange): if an environment
ever re-sampled boundaries per branch, ranks would duplicate or gap.
These tests assert the invariant directly — every rank in 1..n exactly
once, order agreement, exact running sums, and NTILE equivalence with
Spark's own window — so a reuse regression fails loudly rather than
corrupting results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ojo_daps_mirror_spark.operators.rank import (
    attach_prev,
    global_order_stats,
    ntile_from_rank,
)


@pytest.mark.parametrize("n", [1, 237, 10007])
def test_rank_is_a_permutation_and_sorted(spark, n):
    df = spark.range(n).select(
        "id", (F.rand(seed=n) * 997).cast("long").alias("v")
    )
    rows = (
        global_order_stats(df, ["v", "id"], rn_col="rn", cumsum={"cum": "v"})
        .orderBy("rn")
        .collect()
    )
    assert [r["rn"] for r in rows] == list(range(1, n + 1))
    keys = [(r["v"], r["id"]) for r in rows]
    assert keys == sorted(keys)
    running = 0
    for r in rows:
        running += r["v"]
        assert r["cum"] == running


@pytest.mark.parametrize("n", [1, 237, 10007])
def test_attach_prev_matches_global_lag(spark, n):
    df = spark.range(n).select(
        "id", (F.rand(seed=n) * 997).cast("long").alias("v")
    )
    mine = {
        r["id"]: r["prev_v"]
        for r in attach_prev(df, ["v", "id"], {"prev_v": "v"}).collect()
    }
    ref = {
        r["id"]: r["prev_v"]
        for r in df.select(
            "id", F.lag("v").over(Window.orderBy("v", "id")).alias("prev_v")
        ).collect()
    }
    assert mine == ref


def test_rank_operators_hold_with_exchange_reuse_disabled(spark):
    """With spark.sql.exchange.reuse=false the two plan branches no
    longer share one materialized exchange; the operator must detect
    the conf and persist the tagged frame so ranks/lags stay exact."""
    prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
    except Exception:
        pytest.skip("spark.sql.exchange.reuse not settable at runtime")
    try:
        n = 10007
        df = spark.range(n).select(
            "id", (F.rand(seed=7) * 997).cast("long").alias("v")
        )
        rows = (
            global_order_stats(df, ["v", "id"], rn_col="rn")
            .orderBy("rn")
            .collect()
        )
        assert [r["rn"] for r in rows] == list(range(1, n + 1))
        mine = {
            r["id"]: r["prev_v"]
            for r in attach_prev(df, ["v", "id"], {"prev_v": "v"}).collect()
        }
        ref = {
            r["id"]: r["prev_v"]
            for r in df.select(
                "id",
                F.lag("v").over(Window.orderBy("v", "id")).alias("prev_v"),
            ).collect()
        }
        assert mine == ref
    finally:
        spark.conf.set("spark.sql.exchange.reuse", prev)
        spark.catalog.clearCache()


@pytest.mark.parametrize("n,k", [(7, 5), (11, 5), (10, 5), (3, 10), (1009, 10)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    d = spark.createDataFrame([(i,) for i in range(1, n + 1)], "rn bigint")
    mine = {
        r["rn"]: r["b"]
        for r in d.select(
            "rn", ntile_from_rank(F.col("rn"), F.lit(n), k).alias("b")
        ).collect()
    }
    ref = {
        r["rn"]: r["b"]
        for r in d.select(
            "rn", F.ntile(k).over(Window.orderBy("rn")).alias("b")
        ).collect()
    }
    assert mine == ref


@pytest.mark.parametrize("n", [1, 2, 237, 10007])
def test_attach_prev_next_matches_global_lag_lead(spark, n):
    from ojo_daps_mirror_spark.operators.rank import attach_prev_next

    df = spark.range(n).select(
        "id", (F.rand(seed=n) * 997).cast("long").alias("v")
    )
    mine = {
        r["id"]: (r["prev_v"], r["next_v"], r["next_id"])
        for r in attach_prev_next(
            df, ["v", "id"], {"prev_v": "v"}, {"next_v": "v", "next_id": "id"}
        ).collect()
    }
    w = Window.orderBy("v", "id")
    ref = {
        r["id"]: (r["prev_v"], r["next_v"], r["next_id"])
        for r in df.select(
            "id",
            F.lag("v").over(w).alias("prev_v"),
            F.lead("v").over(w).alias("next_v"),
            F.lead("id").over(w).alias("next_id"),
        ).collect()
    }
    assert mine == ref
