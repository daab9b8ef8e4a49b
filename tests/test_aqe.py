"""D14: AQE runtime behaviors on skewed shuffles.

Two invariants of Spark's adaptive execution that the engine's plans
rely on at 100 TB (and that B14's manual salting complements):

1. A skewed SMJ partition is SPLIT at runtime (OptimizeSkewedJoin) when
   the join is terminal — `skew=true` appears in the executed plan.
2. The split is correctly DECLINED when a downstream aggregate requires
   the join's hash partitioning — splitting would force an extra
   shuffle, so AQE keeps the skewed partition intact. This is exactly
   why hot-key-aware ops (B14 salting, C5's bucket caps) still matter
   even with AQE on: AQE cannot split skew it would have to re-shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
}


@pytest.fixture()
def skew_frames(spark):
    old = {}
    for k, v in SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    fact = spark.range(0, 1_500_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    yield fact, dim
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _executed(df):
    # execute through the Dataset's OWN QueryExecution (a .count() or
    # write would plan a fresh query) so the final adaptive plan is the
    # one inspected; materialise JVM-side, never collect rows to Python
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    return qe.executedPlan().toString()


def test_aqe_splits_skewed_terminal_join(spark, skew_frames):
    fact, dim = skew_frames
    plan = _executed(fact.join(dim, "k"))
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:1500]
    assert "skewed" in plan  # AQEShuffleRead ... skewed


def test_aqe_declines_split_under_downstream_partitioning(spark, skew_frames):
    # a groupBy on the join key downstream: splitting the skewed
    # partition would break the required hashpartitioning and force an
    # extra shuffle — AQE must keep the join unsplit
    fact, dim = skew_frames
    plan = _executed(fact.join(dim, "k").groupBy("k").agg(F.sum("v").alias("s")))
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan
