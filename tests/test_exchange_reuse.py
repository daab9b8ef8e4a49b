"""Exchange reuse — SURVEY.md §2 D20.

When the same shuffled subplan feeds two consumers of a join, Spark
must materialise the exchange ONCE and wire the second consumer to a
ReusedExchange node — at 100 TB this halves the shuffle I/O of every
self-join / multi-consumer analytic. Reuse requires canonically
IDENTICAL subplans: the second test documents that an extra
projection on one side (shifting the join key) breaks eligibility —
the practical rule being "derive both sides from the same aggregate
frame, shift predicates not keys, if you want the reuse".
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark.operators.snapshot import monday_of
from ojo_daps_mirror_spark.sources import load_table


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_self_join_reuses_shuffle_exchange(spark, sf_dir):
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a shuffle join: with broadcast on, the tiny weekly frame
    # broadcasts and there is no exchange to reuse — the 100 TB case
    # (aggregate on a high-cardinality key) is the shuffle one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        weekly = (
            load_table(spark, sf_dir, "orders")
            .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j = (
            weekly.alias("a")
            .join(weekly.alias("b"), "week")
            .select("week", F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"))
        )
        plan = _executed_plan(j)
        assert "ReusedExchange" in plan, (
            "self-join over the same aggregate must reuse the shuffle exchange"
        )
        assert all(r["n_a"] == r["n_b"] for r in j.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)


def test_key_shifting_projection_defeats_reuse(spark, sf_dir):
    """Documenting the boundary: projecting week+7 on one side makes
    the two subplans non-canonical — Spark re-shuffles both sides.
    (This is why the engine's WoW comparisons lag/lead over ONE
    aggregate frame instead of self-joining shifted copies.)"""
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        weekly = (
            load_table(spark, sf_dir, "orders")
            .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        shifted = weekly.select(
            (F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("week"),
            F.col("n").alias("n_prev"),
        )
        j = weekly.join(shifted, "week")
        plan = _executed_plan(j)
        assert "ReusedExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
