"""Fiftieth sweep (SURVEY.md §2 B100, C112).

Per-group exact medians via the B95 two-pass order-statistic shape
(histogram + targeted second pass — no per-group sort buffers), and an
operational QC report over the C5 MinHash-LSH index (bucket-size
profile + candidate-pair workload per band — the pre-flight check run
BEFORE a 100 TB dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from ..functions.text import sql_hash64, sql_shingles, sql_tokens
from .text_plans import (
    MH_BUCKET_CAP,
    MH_PERMS,
    MH_PRIME,
    MH_ROWS_PER_BAND,
    MH_SHINGLE_K,
    _MH_A_SQL,
    _MH_B_SQL,
    minhash_bands,
)

# ---------------------------------------------------------------- B100

GM_BUCKET = 100_000  # $1000 coarse buckets over integer cents

_B100_ORACLE = f"""
WITH cents AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_round('quantile_cont(c, 0.5) / 100.0', 4)} AS median_price
FROM cents GROUP BY grp ORDER BY grp
"""


@register("grouped_median_two_pass", oracle=_B100_ORACLE)
def grouped_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT medians with B95's two-pass order-statistic
    shape generalised to grouped form: one (group, bucket) histogram
    (map-side combined), per-group cumulative windows over the
    dimension-scale histogram locate each group's two middle order
    statistics, and the second pass ranks only the (group, bucket)
    cells that contain one — a broadcast semi-join the scan pushes
    down. The per-group exact percentile this replaces buffers every
    group's rows in one reducer; this shape's reducer state is one
    histogram row per bucket.

    Oracle = the engine-native grouped quantile; equality proves the
    grouped decomposition exact, ties and even-n midpoints included.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    hist = cents.groupBy(
        "grp", (F.col("c") / GM_BUCKET).cast("bigint").alias("bkt")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "grp",
        "bkt",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(w_cum).alias("upto"),
    )
    n_grp = cents.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    pos = n_grp.select(
        "grp",
        "n",
        F.explode(
            F.array(
                F.floor((F.col("n") + 1) / 2).cast("bigint"),
                F.floor((F.col("n") + 2) / 2).cast("bigint"),
            )
        ).alias("k"),
    )
    target = pos.join(
        F.broadcast(cum),
        (pos.grp == cum.grp)
        & (F.col("k") > F.col("below"))
        & (F.col("k") <= F.col("upto")),
    ).select(
        pos.grp.alias("tgrp"),
        "n",
        F.col("bkt").alias("tbkt"),
        (F.col("k") - F.col("below")).alias("r"),
    )
    in_bkt = cents.join(
        F.broadcast(target.select("tgrp", "tbkt").distinct()),
        (F.col("grp") == F.col("tgrp"))
        & ((F.col("c") / GM_BUCKET).cast("bigint") == F.col("tbkt")),
    ).select("grp", F.col("tbkt").alias("bkt"), "c")
    w_rank = Window.partitionBy("grp", "bkt").orderBy("c")
    ranked = in_bkt.withColumn("rn", F.row_number().over(w_rank))
    picked = ranked.join(
        F.broadcast(target),
        (F.col("grp") == F.col("tgrp"))
        & (F.col("bkt") == F.col("tbkt"))
        & (F.col("rn") == F.col("r")),
    ).select("grp", "n", "c")
    return (
        picked.groupBy("grp", "n")
        .agg(round_eps(F.avg("c") / 100.0, 4).alias("median_price"))
        .select("grp", F.col("n").alias("n_rows"), "median_price")
        .orderBy("grp")
    )


# ---------------------------------------------------------------- C112

_C112_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
ex AS (
  SELECT doc_id, {sql_hash64('s')} & 2147483647 AS h31
  FROM (SELECT doc_id, unnest(sh) AS s FROM docs)
),
mh AS (
  SELECT doc_id, p,
         MIN(({_MH_A_SQL}[p + 1] * h31 + {_MH_B_SQL}[p + 1]) % {MH_PRIME}) AS mh
  FROM ex CROSS JOIN (SELECT unnest(generate_series(0, {MH_PERMS - 1})) AS p)
  GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {MH_ROWS_PER_BAND} AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY p)) AS sig
  FROM mh GROUP BY doc_id, p // {MH_ROWS_PER_BAND}
),
bsize AS (
  SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS s
  FROM bands GROUP BY band, sig
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(s) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_colliding,
       CAST(MAX(s) AS BIGINT) AS max_bucket,
       CAST(SUM(s * (s - 1) / 2) AS BIGINT) AS est_pairs,
       CAST(SUM(CASE WHEN s > {MH_BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped
FROM bsize GROUP BY band ORDER BY band
"""


@register("lsh_bucket_stats", oracle=_C112_ORACLE)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational QC over the C5 MinHash-LSH index: per band the
    bucket count, colliding-bucket count, largest bucket, implied
    candidate-pair workload Σ s(s−1)/2 and how many buckets the
    MH_BUCKET_CAP skew guard would drop — the pre-flight report run
    BEFORE committing a 100 TB dedup job (est_pairs IS the verify
    stage's input size; one boilerplate-heavy band shows up here as a
    max_bucket spike instead of as an OOM at hour three).

    Scale shape: reuses the shared `minhash_bands` builder (everything
    map-side up to the (band, sig) groupBy — the same single shuffle
    C5 itself pays), then aggregates the bucket-size table to
    |bands| rows. The report costs exactly one LSH index build, never
    touches pair space.
    """
    raw = load_table(spark, sf_dir, "documents")
    bsize = (
        minhash_bands(raw)
        .groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return (
        bsize.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("s").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("s") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_colliding"),
            F.max("s").cast("bigint").alias("max_bucket"),
            F.sum(F.col("s") * (F.col("s") - 1) / 2)
            .cast("bigint")
            .alias("est_pairs"),
            F.sum(F.when(F.col("s") > MH_BUCKET_CAP, 1).otherwise(0))
            .cast("bigint")
            .alias("n_capped"),
        )
        .orderBy("band")
    )
