"""Sixty-ninth sweep (SURVEY.md §2 B127-B128, C141).

Top-N-plus-Other rollup (the BI reshape every dashboard needs and
naive GROUP BY can't produce), K-fold cross-validation variance via
the complement trick (train stats = global − fold, so K folds cost
ONE aggregate), and an ingest-ledger gap audit over the id space (the
exactly-once bookkeeping check an idempotent 100 TB ingest runs after
every load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B127

TOP_N_BRANDS = 10

_B127_ORACLE = f"""
WITH rev AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100
                             + 1e-9) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
),
ranked AS (
  SELECT brand, cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, brand) AS rk
  FROM rev
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev)
SELECT CASE WHEN rk <= {TOP_N_BRANDS} THEN brand ELSE 'Other' END AS brand,
       CAST(MIN(CASE WHEN rk <= {TOP_N_BRANDS} THEN rk
                ELSE {TOP_N_BRANDS + 1} END) AS BIGINT) AS rank,
       CAST(COUNT(*) AS BIGINT) AS n_brands,
       {sql_round('SUM(cents) / 100.0', 2)} AS revenue,
       {sql_round('SUM(cents) * 100.0 / MAX(tot.t)', 4)} AS pct_of_total
FROM ranked CROSS JOIN tot
GROUP BY 1 ORDER BY rank
"""


@register("top_with_other_rollup", oracle=_B127_ORACLE)
def top_with_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 brands by revenue plus an 'Other' bucket that absorbs
    the tail, with percent-of-total — the canonical dashboard reshape
    (a bare GROUP BY either truncates the tail silently or floods the
    chart; the Other row keeps the percentages honest). Deterministic
    (revenue, brand) tie-break on the cut line.

    Scale shape: one fact aggregate to brand grain (broadcast part
    dim onto the fact stream), ranking and the Other fold on the
    |brands| frame, total attached as a broadcast scalar. Exact
    integer cents until the final display division.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        lineitem.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 1e-9
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    rev = rev.persist()
    ranked = rev.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("cents").desc(), "brand")),
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("t"))
    return (
        ranked.transform(scalars(tot))
        .groupBy(
            F.when(F.col("rk") <= TOP_N_BRANDS, F.col("brand"))
            .otherwise("Other")
            .alias("brand")
        )
        .agg(
            F.min(
                F.when(F.col("rk") <= TOP_N_BRANDS, F.col("rk")).otherwise(
                    TOP_N_BRANDS + 1
                )
            )
            .cast("bigint")
            .alias("rank"),
            F.count(F.lit(1)).cast("bigint").alias("n_brands"),
            round_eps(F.sum("cents") / 100.0, 2).alias("revenue"),
            round_eps(F.sum("cents") * 100.0 / F.max("t"), 4).alias(
                "pct_of_total"
            ),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------- B128

CV_FOLDS = 5

_B128_ORACLE = f"""
WITH vals AS (
  SELECT CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS cents,
         CAST({sql_hash64("o_orderkey::VARCHAR || ':cv'")} % {CV_FOLDS}
              AS BIGINT) AS fold
  FROM orders
),
per_fold AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM vals GROUP BY fold
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS gs
  FROM per_fold
),
scored AS (
  SELECT fold, n,
         (gs - s) * 1.0 / (nn - n) AS mu,
         (CAST(ss AS DOUBLE) - 2.0 * ((gs - s) * 1.0 / (nn - n)) * s
          + n * ((gs - s) * 1.0 / (nn - n))
              * ((gs - s) * 1.0 / (nn - n))) / n AS mse
  FROM per_fold CROSS JOIN tot
)
SELECT fold, n AS n_test,
       {sql_round('mu / 100.0', 4)} AS train_mean,
       {sql_round('sqrt(mse) / 100.0', 4)} AS rmse
FROM scored ORDER BY fold
"""


@register("kfold_cv_variance", oracle=_B128_ORACLE)
def kfold_cv_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the global-mean price predictor via
    the COMPLEMENT trick: per-fold sufficient statistics (n, Σ, Σ²)
    computed once, and each fold's training stats derive as
    global − fold — so K folds cost ONE aggregate instead of K
    re-scans (the identity every distributed CV harness should use;
    B114 holds out once for intervals, this rotates for the variance
    of the estimate). Per fold: held-out RMSE against the
    other-folds mean.

    Scale shape: fold id is a pure hash projection, one fact-grain
    aggregate to K rows, global totals derive from those partials,
    and the scoring arithmetic is a K-row projection — exact BIGINT
    cents sufficient statistics, identical float order both engines.
    """
    vals = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("cents"),
        (
            hash64(
                F.concat(F.col("o_orderkey").cast("string"), F.lit(":cv"))
            )
            % CV_FOLDS
        ).alias("fold"),
    )
    per_fold = vals.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        # 128-bit: cents^2 sums overflow BIGINT past ~sf0.05 (found by
        # the sf0.1 bench — ANSI mode turns the overflow into a crash).
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    per_fold = per_fold.persist()
    tot = per_fold.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("gs"),
    )
    mu = (F.col("gs") - F.col("s")) * 1.0 / (F.col("nn") - F.col("n"))
    mse = (
        F.col("ss").cast("double") - 2.0 * mu * F.col("s")
        + F.col("n") * mu * mu
    ) / F.col("n")
    return (
        per_fold.transform(scalars(tot))
        .select(
            "fold",
            F.col("n").alias("n_test"),
            round_eps(mu / 100.0, 4).alias("train_mean"),
            round_eps(F.sqrt(mse) / 100.0, 4).alias("rmse"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------- C141

_C141_ORACLE = f"""
WITH ids AS (
  SELECT source, doc_id FROM documents
),
per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS lo,
         CAST(MAX(doc_id) AS BIGINT) AS hi
  FROM ids GROUP BY 1
),
runs AS (
  SELECT source,
         doc_id - ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
           AS grp
  FROM ids
),
islands AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_runs
  FROM (SELECT DISTINCT source, grp FROM runs) GROUP BY source
)
SELECT p.source, p.n_docs, p.lo AS min_id, p.hi AS max_id,
       CAST(p.hi - p.lo + 1 - p.n_docs AS BIGINT) AS missing_ids,
       CAST(i.n_runs - 1 AS BIGINT) AS n_gaps,
       CAST(CASE WHEN p.hi - p.lo + 1 = p.n_docs THEN 1 ELSE 0 END
            AS BIGINT) AS contiguous
FROM per_source p JOIN islands i USING (source)
ORDER BY p.source
"""


@register("ingest_ledger_audit", oracle=_C141_ORACLE)
def ingest_ledger_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-ledger completeness audit over the per-source doc-id
    space: high/low watermarks, missing-id count (hi−lo+1 − n) and
    the number of GAPS (contiguous-run count − 1, by gap-and-islands —
    B108's trick on the ID axis instead of the time axis). The
    after-every-load check of an idempotent ingest: a nonzero gap
    count localises WHERE a loader dropped a batch, which the plain
    missing-count can't. Sources whose id range is interleaved with
    others legitimately show missing ids but the gap count still
    bounds the re-scan work.

    Scale shape: one per-source aggregate for watermarks plus one
    per-source rank window for runs (both shuffle on the same source
    key — at 100 TB this is a single stage over source-partitioned
    ids); the audit output is |sources| rows.
    """
    ids = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    per_source = ids.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("lo"),
        F.max("doc_id").cast("bigint").alias("hi"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    runs = ids.select(
        "source", (F.col("doc_id") - F.row_number().over(w)).alias("grp")
    )
    islands = (
        runs.distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"))
    )
    return (
        per_source.join(islands, "source")
        .select(
            "source",
            "n_docs",
            F.col("lo").alias("min_id"),
            F.col("hi").alias("max_id"),
            (F.col("hi") - F.col("lo") + 1 - F.col("n_docs"))
            .cast("bigint")
            .alias("missing_ids"),
            (F.col("n_runs") - 1).cast("bigint").alias("n_gaps"),
            F.when(
                F.col("hi") - F.col("lo") + 1 == F.col("n_docs"), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("contiguous"),
        )
        .orderBy("source")
    )
