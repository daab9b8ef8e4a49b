"""Fifty-eighth sweep (SURVEY.md §2 C124-C125, B111).

Privacy/release auditing (k-anonymity + l-diversity equivalence
classes), population-stability-index drift between corpus sources
(the industry drift metric next to C60's KL), and a rendezvous-hash
shard map with an elastic-resize movement audit (the routing layer a
100 TB serving tier needs; complements B106's LPT packing which
optimises balance but reshuffles everything on resize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C124

K_ANON = 5
L_DIV = 3

_C124_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
              AS BIGINT) AS l_distinct
  FROM customer GROUP BY 1, 2
)
SELECT nationkey, mktsegment, class_size, l_distinct,
       CAST(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END
            AS BIGINT) AS k_violation,
       CAST(CASE WHEN l_distinct < {L_DIV} THEN 1 ELSE 0 END
            AS BIGINT) AS l_violation
FROM classes ORDER BY nationkey, mktsegment
"""


@register("k_anonymity_audit", oracle=_C124_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit before a data release: group
    records by their quasi-identifier tuple (nation, market segment),
    measure each equivalence class's size (k) and the diversity of
    the sensitive attribute within it (distinct 1000-unit balance
    bands = l), and flag classes below k=5 or l=3 — the classes an
    attacker can re-identify or attribute-infer from. The reference
    publishes aggregate indicators from ad-level data
    (flows/aggregate/*); this is the audit that decides which cells
    are safe to publish.

    Scale shape: a single groupBy on the quasi-identifier tuple with
    a COUNT DISTINCT over a coarsened band — one shuffle at class
    grain, no joins; the flags are pure projections of the
    aggregate. At 100 TB the class count (cross-product of
    quasi-identifier domains) stays tiny relative to rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
            )
            .cast("bigint")
            .alias("l_distinct"),
        )
    )
    return (
        classes.select(
            "nationkey",
            "mktsegment",
            "class_size",
            "l_distinct",
            F.when(F.col("class_size") < K_ANON, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("k_violation"),
            F.when(F.col("l_distinct") < L_DIV, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("l_violation"),
        )
        .orderBy("nationkey", "mktsegment")
    )


# ---------------------------------------------------------------- C125

PSI_BIN_WIDTH = 64
PSI_BINS = 10

_C125_ORACLE = f"""
WITH binned AS (
  SELECT source, LEAST(n_chars // {PSI_BIN_WIDTH}, {PSI_BINS - 1}) AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
),
src_tot AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_src FROM binned GROUP BY 1
),
base AS (
  SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt_all FROM binned GROUP BY 1
),
base_tot AS (SELECT CAST(SUM(cnt_all) AS BIGINT) AS n_all FROM base),
grid AS (
  SELECT s.source, b.bin, s.n_src, b.cnt_all, t.n_all,
         COALESCE(x.cnt, 0) AS cnt
  FROM src_tot s CROSS JOIN base b CROSS JOIN base_tot t
  LEFT JOIN binned x ON x.source = s.source AND x.bin = b.bin
),
terms AS (
  SELECT source,
         ((cnt + 0.5) / (n_src + 0.5 * {PSI_BINS})
          - (cnt_all + 0.5) / (n_all + 0.5 * {PSI_BINS}))
         * ln(((cnt + 0.5) / (n_src + 0.5 * {PSI_BINS}))
              / ((cnt_all + 0.5) / (n_all + 0.5 * {PSI_BINS}))) AS term
  FROM grid
)
SELECT source, {sql_round('SUM(term)', 6)} AS psi,
       CAST(CASE WHEN SUM(term) > 0.2 THEN 1 ELSE 0 END AS BIGINT)
         AS drift_flag
FROM terms GROUP BY source ORDER BY source
"""


@register("psi_drift", oracle=_C125_ORACLE)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole-corpus baseline:
    PSI = Σ_bins (p_src − p_base)·ln(p_src/p_base) with 0.5-count
    smoothing, flagging sources past the classic 0.2 "significant
    shift" threshold. The monitoring metric next to C60's KL — PSI is
    symmetric-ish in practice, binned, and what drift dashboards
    actually plot. Reference analog: dqa/ distribution checks over
    weekly ad batches.

    Scale shape: one pass bins every document (bin id is a pure
    projection), a (source × bin) aggregate — at most |sources|·10
    rows — then the baseline histogram derives from THOSE partials
    (no second corpus scan) and attaches by a broadcast join on bin.
    The zero-count bins each source is missing are restored by a
    broadcast grid join at class grain, never by re-scanning facts.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / PSI_BIN_WIDTH).cast("bigint"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    binned = docs.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    binned = binned.persist()
    src_tot = binned.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_src")
    )
    base = binned.groupBy("bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt_all")
    )
    base_tot = base.agg(F.sum("cnt_all").cast("bigint").alias("n_all"))
    grid = (
        src_tot.transform(scalars(base))
        .transform(scalars(base_tot))
        .join(F.broadcast(binned), ["source", "bin"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    p_src = (F.col("cnt") + 0.5) / (F.col("n_src") + 0.5 * PSI_BINS)
    p_base = (F.col("cnt_all") + 0.5) / (F.col("n_all") + 0.5 * PSI_BINS)
    terms = grid.select(
        "source", ((p_src - p_base) * F.log(p_src / p_base)).alias("term")
    )
    return (
        terms.groupBy("source")
        .agg(
            round_eps(F.sum("term"), 6).alias("psi"),
            F.when(F.sum("term") > 0.2, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("drift_flag"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- B111

RV_SHARDS = 8


def _rv_assign_sql(n: int) -> str:
    """DuckDB: rendezvous winner among n shards for doc_id."""
    return f"""
    (SELECT s FROM (
       SELECT r.range AS s,
              {sql_hash64("d.doc_id::VARCHAR || '#' || r.range::VARCHAR")}
                AS w
       FROM range({n}) r ORDER BY w DESC, s LIMIT 1
     ))
    """


_B111_ORACLE = f"""
WITH assigned AS (
  SELECT d.doc_id, d.n_chars,
         {_rv_assign_sql(RV_SHARDS)} AS shard,
         {_rv_assign_sql(RV_SHARDS + 1)} AS shard_next
  FROM documents d
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN shard_next <> shard THEN 1 ELSE 0 END)
            AS BIGINT) AS moved,
       {sql_round(
           'SUM(CASE WHEN shard_next <> shard THEN 1 ELSE 0 END)'
           ' * 1.0 / COUNT(*)', 6)} AS moved_frac
FROM assigned GROUP BY shard ORDER BY shard
"""


def _rv_assign(doc_id, n: int):
    """Spark: argmax-by-weight shard via array_max over (w, shard) structs."""
    cands = F.array(
        *[
            F.struct(
                hash64(
                    F.concat(
                        doc_id.cast("string"), F.lit("#"), F.lit(str(s))
                    )
                ).alias("w"),
                F.lit(s).cast("bigint").alias("s"),
            )
            for s in range(n)
        ]
    )
    # ties broken toward the LOWER shard id to match ORDER BY w DESC, s
    return F.array_max(
        F.transform(cands, lambda c: F.struct(c["w"].alias("w"), (-c["s"]).alias("ns")))
    )["ns"] * -1


@register("rendezvous_shard_map", oracle=_B111_ORACLE)
def rendezvous_shard_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing for the
    document corpus: each doc goes to argmax_s hash(doc_id, s) over 8
    shards, and the audit simulates an elastic resize to 9 shards —
    rendezvous guarantees ONLY the ~1/9 of keys that win on the new
    shard move, unlike mod-N (which moves ~8/9). Output: per-shard
    doc count, byte load, and the measured moved fraction. This is
    the routing layer for a serving/index tier over the corpus; it
    complements B106's LPT packing (optimal balance, full reshuffle
    on resize) with minimal-movement balance.

    Scale shape: assignment is a pure map-side projection (an
    8-element array argmax of cheap hashes — no shuffle, no join, no
    routing table to maintain or broadcast); the only shuffle is the
    final 8-row audit aggregate. Adding shard 9 re-evaluates the same
    projection — no state migration plan needed beyond the moved set.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    assigned = docs.select(
        "n_chars",
        _rv_assign(F.col("doc_id"), RV_SHARDS).alias("shard"),
        _rv_assign(F.col("doc_id"), RV_SHARDS + 1).alias("shard_next"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.when(F.col("shard_next") != F.col("shard"), 1).otherwise(0))
            .cast("bigint")
            .alias("moved"),
            round_eps(
                F.sum(
                    F.when(F.col("shard_next") != F.col("shard"), 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("moved_frac"),
        )
        .orderBy("shard")
    )
