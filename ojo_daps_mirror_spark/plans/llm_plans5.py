"""LLM training-data plans, fifth sweep (SURVEY.md §2 C42–C44).

Cross-source duplication profiling (the dataset-card overlap matrix),
percentile-normalised quality blending, and the batch CDC merge/upsert
(the MERGE INTO shape lakehouse pipelines run on every ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    STOPWORDS,
    shingles,
    sql_shingles,
    sql_stopword_hits,
    sql_tokens,
    stopword_hits,
    tokens,
)
from ..operators.attach import attach_scalars
from ..operators.rank import global_order_stats
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- C42

OVERLAP_SHINGLE_K = 3

_C42_ORACLE = f"""
WITH ss AS (
  SELECT DISTINCT source,
         unnest({sql_shingles(sql_tokens("text"), OVERLAP_SHINGLE_K)}) AS s
  FROM documents
),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ss GROUP BY source
),
shared AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS shared
  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s1, s2, shared, t1.n AS n1, t2.n AS n2,
       {sql_round("shared / (t1.n + t2.n - shared)", 6)} AS jaccard
FROM shared
JOIN totals t1 ON t1.source = s1
JOIN totals t2 ON t2.source = s2
ORDER BY s1, s2
"""


@register("cross_source_overlap", oracle=_C42_ORACLE)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication matrix: shingle-level Jaccard overlap
    between every pair of corpus sources — the dataset-card number that
    decides which sources are redundant before mixing (e.g. two
    CommonCrawl snapshots sharing 60% of their shingles).

    Scale shape: the naive form is a shingle self-join (quadratic in
    hot shingles). Instead: one groupBy at shingle grain collects each
    shingle's distinct source SET (bounded by |sources|, ~20, never by
    corpus size), pairs expand MAP-SIDE from that array
    (|sources|² max per shingle), and the pair counts aggregate
    map-side-combined to a |sources|² result. Two bounded shuffles, no
    self-join, no row blow-up beyond shared-shingle × pair count. The
    DuckDB oracle uses the self-join form — same result, different
    (non-scalable) plan, which is exactly the point.
    """
    # Examined for the optimization round and deliberately left in the
    # two-branch shape: the totals and source-set branches share the
    # identical (source, shingle) DISTINCT exchange, which ReuseExchange
    # materializes ONCE — a measured single-pass rewrite (markers emitted
    # from the source-set arrays, distinct dropped in favour of
    # collect_set dedup) ran 0.3-0.5 s SLOWER at sf0.1 because the
    # distinct is a codegen HashAggregate that shrinks the input of the
    # slower object-hash collect_set aggregate.
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    ss = docs.select(
        "source",
        F.explode(shingles(tokens(F.col("text")), OVERLAP_SHINGLE_K)).alias("s"),
    ).distinct()
    totals = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    srcs = ss.groupBy("s").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    pairs = srcs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("srcs"), i + 2, F.greatest(F.size("srcs") - i - 1, F.lit(0))
                        ),
                        lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.s1", "p.s2")
    shared = pairs.groupBy("s1", "s2").agg(F.count(F.lit(1)).alias("shared"))
    t1 = totals.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    t2 = totals.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    return (
        shared.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .select(
            "s1",
            "s2",
            "shared",
            "n1",
            "n2",
            round_eps(
                F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------- C43

BLEND_W_LEN = 0.5
BLEND_W_STOP = 0.5

_stop_sql = sql_stopword_hits(sql_tokens("text"))

_C43_ORACLE = f"""
WITH sig AS (
  SELECT doc_id,
         len({sql_tokens("text")}) AS n_tokens,
         {_stop_sql} / greatest(len({sql_tokens("text")}), 1) AS stop_ratio
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
         {sql_round("stop_ratio", 6)} AS stop_ratio,
         PERCENT_RANK() OVER (ORDER BY n_tokens, doc_id) AS pr_len,
         PERCENT_RANK() OVER (ORDER BY stop_ratio, doc_id) AS pr_stop
  FROM sig
)
SELECT doc_id, n_tokens, stop_ratio,
       {sql_round(f"{BLEND_W_LEN} * pr_len + {BLEND_W_STOP} * pr_stop", 6)}
         AS quality_blend
FROM ranked
ORDER BY doc_id
"""


@register("quality_percentile_blend", oracle=_C43_ORACLE)
def quality_percentile_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-normalised quality blending: raw signals (token
    count, stopword ratio) mapped to corpus percent-ranks and averaged
    — the standard way to combine incommensurable quality scores
    (length in tokens vs a 0-1 ratio) into one filterable number
    without hand-tuned scaling.

    Scale shape: percent_rank needs a global order, which at test SFs
    is one window (single-reducer sort). The 100 TB swap — documented,
    same as A37/C34 — is approx_percentile over each signal to build a
    ~1000-cut broadcast CDF and map each row to its bucket rank
    map-side: no global sort, rank error ≤ 1/cuts. Executable via
    SPARK_GRAFT_SCALE_MODE=approx (scale_mode.attach_cdf_ranks). The window form is
    the oracle-parity choice; ties are broken by doc_id so the rank is
    deterministic in both engines.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    sig = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (
            stopword_hits(toks) / F.greatest(F.size(toks), F.lit(1))
        ).alias("stop_ratio_raw"),
    )
    # percent_rank = (rank-1)/(n-1) from two range-partitioned
    # global ranks (the tiebroken order is total, so rank ==
    # row_number) — no unpartitioned windows over doc grain
    # (operators/rank.py).
    if sm.is_approx():
        # broadcast-CDF ranks: both signals' cut arrays come from ONE
        # 1-row sketch aggregate; ranking is map-side, no global sort
        ranked = sm.attach_cdf_ranks(
            sig, {"n_tokens": "pr_len", "stop_ratio_raw": "pr_stop"}
        ).select(
            "doc_id",
            "n_tokens",
            round_eps(F.col("stop_ratio_raw"), 6).alias("stop_ratio"),
            "pr_len",
            "pr_stop",
        )
        return ranked.select(
            "doc_id",
            "n_tokens",
            "stop_ratio",
            round_eps(
                BLEND_W_LEN * F.col("pr_len")
                + BLEND_W_STOP * F.col("pr_stop"),
                6,
            ).alias("quality_blend"),
        ).orderBy("doc_id")
    n_tot = sig.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    ranked = attach_scalars(
        global_order_stats(
            global_order_stats(
                sig, ["n_tokens", "doc_id"], rn_col="rn_len"
            ),
            ["stop_ratio_raw", "doc_id"],
            rn_col="rn_stop",
        ),
        n_tot,
    ).select(
        "doc_id",
        "n_tokens",
        round_eps(F.col("stop_ratio_raw"), 6).alias("stop_ratio"),
        # guard the 1-row corpus: (rn-1)/(n-1) is 0/0 there, while
        # PERCENT_RANK (Spark and DuckDB alike) defines it as 0.0
        F.when(
            F.col("n_tot") > 1, (F.col("rn_len") - 1) / (F.col("n_tot") - 1)
        ).otherwise(F.lit(0.0)).alias("pr_len"),
        F.when(
            F.col("n_tot") > 1, (F.col("rn_stop") - 1) / (F.col("n_tot") - 1)
        ).otherwise(F.lit(0.0)).alias("pr_stop"),
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "stop_ratio",
        round_eps(
            BLEND_W_LEN * F.col("pr_len") + BLEND_W_STOP * F.col("pr_stop"), 6
        ).alias("quality_blend"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C44

_C44_ORACLE = """
WITH latest AS (
  SELECT user_id, ROUND(value + 1e-9, 4) AS new_balance
  FROM (
    SELECT user_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT COALESCE(c.c_custkey, l.user_id) AS custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN l.user_id IS NULL THEN 'keep'
            ELSE 'update' END AS action,
       CASE WHEN l.user_id IS NULL
            THEN ROUND(c.c_acctbal + 1e-9, 4)
            ELSE l.new_balance END AS acctbal,
       c.c_mktsegment AS mktsegment
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
ORDER BY custkey
"""


@register("cdc_merge", oracle=_C44_ORACLE)
def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC merge — the MERGE INTO shape every lakehouse ingest
    runs: a changelog (latest purchase value per user, deterministic
    argmax by (ts, event_id)) upserted into the customer dimension.
    Matched keys take the new balance ('update'), unmatched dimension
    rows pass through ('keep'), changelog keys missing from the
    dimension become new rows ('insert') — SCD type 1, next to B22's
    SCD2 interval build.

    Scale shape: the changelog first collapses to one row per key (a
    map-side-combined argmax agg — never join the raw log), then ONE
    full-outer shuffle join on the merge key. At 100 TB both sides
    hash-partition on the key; with a bucketed dimension table (D3)
    the dimension side's exchange disappears entirely.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    latest = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(
                F.max_by("value", F.struct("ts", "event_id")) + 1e-9, 4
            ).alias("new_balance")
        )
    )
    merged = cust.join(latest, cust.c_custkey == latest.user_id, "full_outer")
    return merged.select(
        F.coalesce("c_custkey", "user_id").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("user_id").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.when(
            F.col("user_id").isNull(), F.round(F.col("c_acctbal") + 1e-9, 4)
        )
        .otherwise(F.col("new_balance"))
        .alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).orderBy("custkey")
