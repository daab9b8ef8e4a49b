"""Runtime (bloom) filter injection — SURVEY.md §2 D19.

A selective dimension predicate should inject a bloom filter into the
fact-side scan of a shuffle join, so the fact table is pre-filtered
BEFORE the shuffle — at 100 TB this is the difference between
shuffling every lineitem row and shuffling only rows whose order can
possibly survive. Spark's InjectRuntimeFilter rewrites the fact scan
to `might_contain(bloom_filter_agg(join_key), key)`.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ojo_daps_mirror_spark.sources import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_runtime_bloom_filter_injected_on_selective_join(spark, sf_dir):
    confs = {
        # thresholds are sized for production scans; pin them down so
        # the sf0.001 fixture qualifies — the REWRITE is what's tested
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ) == "true", "bloom injection must be on by default in the session"
        o = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy()
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
        assert "might_contain" in plan, "fact scan not rewritten with might_contain"
        # and the filtered plan still computes the right answer
        expected = (
            li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
            .groupBy()
            .agg(F.sum("l_quantity").alias("q"))
            .collect()[0]["q"]
        )
        assert j.collect()[0]["q"] == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
