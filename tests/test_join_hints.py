"""D20 — join strategy hints are honored (SURVEY.md §2 D).

At 100 TB the optimizer's estimates are sometimes wrong (fresh tables
without stats, exploding intermediate results); hints are the
operator's manual override. These tests pin the contract: a BROADCAST
hint forces a broadcast join even when auto-broadcast is disabled, a
MERGE hint forces sort-merge even for tiny inputs, SHUFFLE_HASH forces
a shuffled hash join — and all three return identical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ojo_daps_mirror_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _joined(spark, sf_dir, hint: str | None):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    if hint:
        cust = cust.hint(hint)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


def test_broadcast_hint_forces_broadcast(spark, sf_dir):
    # with auto-broadcast OFF, only the hint can produce a broadcast join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        unhinted = _joined(spark, sf_dir, None)
        assert "BroadcastHashJoin" not in _plan(unhinted)
        hinted = _joined(spark, sf_dir, "broadcast")
        assert "BroadcastHashJoin" in _plan(hinted)
        assert [tuple(r) for r in hinted.collect()] == [
            tuple(r) for r in unhinted.collect()
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_hint_forces_sort_merge(spark, sf_dir):
    hinted = _joined(spark, sf_dir, "merge")
    assert "SortMergeJoin" in _plan(hinted)


def test_shuffle_hash_hint_forces_hash_join(spark, sf_dir):
    hinted = _joined(spark, sf_dir, "shuffle_hash")
    assert "ShuffledHashJoin" in _plan(hinted)
