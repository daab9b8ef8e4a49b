"""Semantic tests for A38 / C49 / C50."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.plans.llm_plans7 import N_SHARDS
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def test_universal_week_matches_python_isocalendar(spark, sf_dir):
    """The Spark iso-year/week must agree with Python's isocalendar —
    the reference's own implementation (s3_counts_utils.py:82)."""
    rows = plans.QUERIES["universal_week_counts"](spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    manual = {}
    for r in events:
        y, w, _ = r.ts.isocalendar()
        key = ((y - 1) * 53 + w, y, w, r.event_type)
        manual[key] = manual.get(key, 0) + 1
    got = {
        (r.universal_week, r.iso_year, r.iso_week, r.event_type): r.n_ads
        for r in rows
    }
    assert got == manual


def test_shard_assign_partitions_all_docs(spark, sf_dir):
    rows = plans.QUERIES["dataset_shard_assign"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are dense 1..k within each shard
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shard_assign_stable_under_repartition(spark, sf_dir):
    """Content-derived assignment must not change when the input is
    re-partitioned — the reproducibility contract rand() can't give."""
    base = {
        (r.doc_id, r.shard, r.pos)
        for r in plans.QUERIES["dataset_shard_assign"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(7)
    from ojo_daps_mirror_spark.plans.llm_plans7 import dataset_shard_assign  # noqa

    # rebuild on the repartitioned frame via the same expressions
    from pyspark.sql.window import Window

    ordkey = F.md5(F.col("doc_id").cast("string"))
    shard = F.conv(F.substring(ordkey, 1, 8), 16, 10).cast("bigint") % N_SHARDS
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    again = {
        (r.doc_id, r.shard, r.pos)
        for r in docs.select("doc_id", shard.alias("shard"), ordkey.alias("ord"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert again == base


def test_source_concentration_shares_sum_to_one(spark, sf_dir):
    rows = plans.QUERIES["source_concentration"](spark, sf_dir).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1].cum_share - 1.0) < 1e-4
    # cum_share is monotone along the rank order; hhi constant & bounded
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
    hhi = {r.hhi for r in rows}
    assert len(hhi) == 1
    lo = 1.0 / len(rows)
    assert lo - 1e-6 <= hhi.pop() <= 1.0
