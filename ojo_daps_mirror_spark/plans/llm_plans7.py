"""Seventh sweep (SURVEY.md §2 A38, C49–C50).

Universal-week collection counts (the reference's monitoring-series
time index), deterministic dataset shard assignment (the training-data
global shuffle), and a source-concentration report (share / cumulative
share / HHI — the mixing-diversity dataset-card block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- A38

_A38_ORACLE = """
SELECT (isoyear(ts) - 1) * 53 + week(ts) AS universal_week,
       CAST(isoyear(ts) AS BIGINT) AS iso_year,
       CAST(week(ts) AS BIGINT) AS iso_week,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_ads
FROM events
GROUP BY isoyear(ts), week(ts), event_type
ORDER BY universal_week, event_type
"""


@register("universal_week_counts", oracle=_A38_ORACLE)
def universal_week_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection counts on the reference's "universal week" axis —
    dqa/s3_counts_utils.py:89 `isoweek_to_universal_week`:
    (iso_year − 1) × 53 + iso_week, the monotone week index every
    monitoring series (s3_counts.py weekly plots) is keyed by. ISO
    week semantics matter at year boundaries: Jan 1 can belong to
    week 52/53 of the PREVIOUS iso-year, which a naive
    year*53+weekofyear index mis-buckets.

    Scale shape: pure scalar time projection + one map-side-combined
    aggregate to |weeks|×|boards| rows — the monitoring query a 100 TB
    event lake runs per ingest tick.
    """
    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    iso_year = F.expr("extract(YEAROFWEEK FROM ts)").cast("bigint")
    iso_week = F.weekofyear("ts").cast("bigint")
    return (
        events.groupBy(
            iso_year.alias("iso_year"),
            iso_week.alias("iso_week"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_ads"))
        .select(
            ((F.col("iso_year") - 1) * 53 + F.col("iso_week")).alias(
                "universal_week"
            ),
            "iso_year",
            "iso_week",
            "event_type",
            "n_ads",
        )
        .orderBy("universal_week", "event_type")
    )


# ---------------------------------------------------------------- C49

N_SHARDS = 16

_C49_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           % {N_SHARDS} AS shard,
         md5(doc_id::VARCHAR) AS ord
  FROM documents
)
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS pos
FROM assigned
ORDER BY shard, pos
"""


@register("dataset_shard_assign", oracle=_C49_ORACLE)
def dataset_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment: every doc maps
    to one of {N_SHARDS} training shards by a content-derived md5
    bucket, with a stable pseudo-random position inside the shard
    (md5 order) — the pre-training "shuffle the corpus, write N shard
    files" pass, reproducible across runs/engines and independent of
    input partitioning (rand() or zipWithIndex would be neither).

    Scale shape: shard assignment is map-only; the in-shard position
    is one window per shard — {N_SHARDS} parallel sorts that together
    touch each row once, which IS the global shuffle (you cannot
    shuffle 100 TB without one full repartition+sort); writing then
    partitions by shard (D2) so each shard lands as one sorted file
    set.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ordkey = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(ordkey, 1, 8), 16, 10).cast("bigint") % N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), ordkey.alias("ord"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------- C50

_C50_ORACLE = f"""
WITH per_source AS (
  SELECT source, CAST(SUM(len({sql_tokens("text")})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
shares AS (
  SELECT source, n_tokens,
         n_tokens * 1.0 / SUM(n_tokens) OVER () AS share,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source) AS rnk
  FROM per_source
)
SELECT source, n_tokens,
       CAST(rnk AS BIGINT) AS rnk,
       {sql_round("share", 6)} AS share,
       {sql_round(
           "SUM(share) OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING)", 6
       )} AS cum_share,
       {sql_round("SUM(share * share) OVER ()", 6)} AS hhi
FROM shares
ORDER BY rnk
"""


@register("source_concentration", oracle=_C50_ORACLE)
def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration report: per-source token share, cumulative
    share in descending order, and the corpus Herfindahl–Hirschman
    index (Σ share²) — the diversity block of a dataset card; a high
    HHI means a couple of sources dominate the mix and temperature
    resampling (C33) has work to do.

    Scale shape: the corpus reduces to |sources| rows in ONE
    map-side-combined aggregate; every window after that runs on the
    tiny source table (a single partition of ~tens of rows — the
    global windows are free at that grain, and never touch the
    corpus).
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("n_tokens")
    )
    w_all = Window.partitionBy(F.lit(1))
    shares = per_source.select(
        "source",
        "n_tokens",
        (F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w_all)).alias("share"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_tokens"), F.asc("source")))
        .cast("bigint")
        .alias("rnk"),
    )
    w_cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return shares.select(
        "source",
        "n_tokens",
        "rnk",
        round_eps(F.col("share"), 6).alias("share"),
        round_eps(F.sum("share").over(w_cum), 6).alias("cum_share"),
        round_eps(F.sum(F.col("share") * F.col("share")).over(w_all), 6).alias(
            "hhi"
        ),
    ).orderBy("rnk")
