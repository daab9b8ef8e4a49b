"""Thirty-third sweep (SURVEY.md §2 B67, C92–C93).

CUSUM changepoint detection on the weekly order series, DSIR-style
hashed-n-gram importance weighting for corpus selection (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"),
and cross-document exact-substring contamination scoring (the
repeated-span measure from Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64, sql_tokens, tokens
from ..operators.snapshot import monday_of
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B67

CUSUM_H = 5.0  # flag threshold in cumulative-σ units

_B67_ORACLE = f"""
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate)::DATE AS week,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
stats AS (
  SELECT week, n_orders,
         AVG(n_orders) OVER () AS mu,
         STDDEV_SAMP(n_orders) OVER () AS sigma
  FROM weekly
),
cum AS (
  SELECT week, n_orders,
         SUM((n_orders - mu) / sigma) OVER (
           ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cusum
  FROM stats
)
SELECT strftime(week, '%Y-%m-%d') AS week, n_orders,
       {sql_round("cusum", 6)} AS cusum,
       CASE WHEN abs(cusum) > {CUSUM_H} THEN 1 ELSE 0 END AS is_change
FROM cum ORDER BY week
"""


@register("cusum_changepoints", oracle=_B67_ORACLE)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint flags over the weekly order-volume series:
    S_i = Σ_{j≤i} (x_j − μ)/σ, flagged where |S_i| exceeds CUSUM_H —
    the drift detector behind pipeline-volume monitoring (the
    monitoring role of the reference's dqa weekly counts,
    dqa/data_getters.py:iterdates).

    Scale shape: the fact table collapses to |weeks| rows in ONE
    map-side-combined aggregate; μ/σ and the ordered cumulative sum
    are unbounded windows over that dimension-scale frame (a few
    hundred rows regardless of corpus size), so the only data-volume
    stage is the first groupBy. Both engines run the running sum in
    identical week order, so the doubles agree to well inside the
    6-dp round.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("week").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = weekly.select(
        "week",
        "n_orders",
        F.avg("n_orders").over(w_all).alias("mu"),
        F.stddev_samp("n_orders").over(w_all).alias("sigma"),
    )
    cum = stats.select(
        "week",
        "n_orders",
        F.sum((F.col("n_orders") - F.col("mu")) / F.col("sigma"))
        .over(w_cum)
        .alias("cusum"),
    )
    return cum.select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "n_orders",
        round_eps(F.col("cusum"), 6).alias("cusum"),
        F.when(F.abs("cusum") > CUSUM_H, 1).otherwise(0).alias("is_change"),
    ).orderBy("week")


# ---------------------------------------------------------------- C92

DSIR_BUCKETS = 256  # hashed-unigram feature space (Xie et al. use 10k)
DSIR_TARGET_LANG = "en"  # the "target distribution" slice


def _c92_lr_sql() -> str:
    b = DSIR_BUCKETS
    return (
        f"ln((cnt_tgt + 1.0) / (tot_tgt + {b})) - "
        f"ln((cnt_raw + 1.0) / (tot_raw + {b}))"
    )


_C92_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({sql_tokens('text')}) AS t FROM documents
),
db AS (
  SELECT doc_id, lang, {sql_hash64('t')} % {DSIR_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok WHERE t <> '' GROUP BY 1, 2, 3
),
bs0 AS (
  SELECT bucket, SUM(cnt) AS cnt_raw,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN cnt ELSE 0 END) AS cnt_tgt
  FROM db GROUP BY 1
),
bs AS (
  SELECT bucket,
         CAST(ROUND(({_c92_lr_sql().replace('tot_tgt',
             'SUM(cnt_tgt) OVER ()').replace('tot_raw',
             'SUM(cnt_raw) OVER ()')}) * 1e9) AS BIGINT) AS lr_n
  FROM bs0
),
scored AS (
  SELECT db.doc_id, SUM(db.cnt) AS n_tokens,
         {sql_round('SUM(db.cnt * bs.lr_n) / 1e9', 6)} AS logw
  FROM db JOIN bs USING (bucket) GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, logw,
       CASE WHEN logw > 0 THEN 1 ELSE 0 END AS selected
FROM scored ORDER BY doc_id
"""


@register("dsir_importance", oracle=_C92_ORACLE)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR corpus selection: per-document importance log-weight
    log p_target(x)/p_raw(x) under add-one-smoothed hashed-unigram
    bag models, target = the '{DSIR_TARGET_LANG}' slice — the
    published importance-resampling recipe for picking pretraining
    data that "looks like" a target domain.

    Scale shape: the token stream is touched ONCE and immediately
    collapsed to (doc, bucket) grain — the only corpus-volume shuffle.
    The bucket model is a {DSIR_BUCKETS}-row frame (normalising totals
    via an unbounded window over it, not a second scan) that
    auto-broadcasts into the scoring join; per-doc scoring is then a
    doc-grain aggregate. Log-ratios are quantised to integer
    nano-units before the weighted sum so the per-doc reduction is
    EXACT bigint arithmetic (immune to FP add ordering) in both
    engines, and selection thresholds on the rounded weight so the
    boundary can't flip cross-engine.
    """
    scored = _dsir_scored(spark, sf_dir)
    return scored.select(
        "doc_id",
        "n_tokens",
        "logw",
        F.when(F.col("logw") > 0, 1).otherwise(0).alias("selected"),
    ).orderBy("doc_id")


def _dsir_scored(
    spark: SparkSession, sf_dir: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """The C92 per-document scored frame (doc_id, *carry, n_tokens,
    logw). ``carry`` columns must be functionally dependent on doc_id
    (e.g. ``source``): they ride the (doc, bucket) aggregate without
    changing its groups, so consumers that need them (C122's per-source
    ESS) skip a doc-grain join against C92's output entirely."""
    b = F.lit(DSIR_BUCKETS)
    docs = load_table(spark, sf_dir, "documents")
    db = (
        docs.select(
            "doc_id", "lang", *carry, F.explode(tokens(F.col("text"))).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy(
            "doc_id", "lang", *carry, (hash64(F.col("t")) % b).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy()
    bs = (
        db.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("cnt_raw"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")).otherwise(0)
            ).alias("cnt_tgt"),
        )
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.col("cnt_tgt") + 1.0)
                        / (F.sum("cnt_tgt").over(w_all) + b)
                    )
                    - F.log(
                        (F.col("cnt_raw") + 1.0)
                        / (F.sum("cnt_raw").over(w_all) + b)
                    )
                )
                * 1e9
            )
            .cast("bigint")
            .alias("lr_n"),
        )
    )
    return (
        db.join(bs, "bucket")
        .groupBy("doc_id", *carry)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            round_eps(F.sum(F.col("cnt") * F.col("lr_n")) / 1e9, 6).alias("logw"),
        )
    )


# ---------------------------------------------------------------- C93

SPAN_K = 8  # tokens per window (Lee et al. use 50-token spans)


def _windows(toks: Column, k: int = SPAN_K) -> Column:
    """All k-token windows (duplicates kept — unlike shingles())."""
    cur = toks
    for off in range(1, k):
        shifted = F.slice(toks, off + 1, F.greatest(F.size(toks) - off, F.lit(0)))
        cur = F.zip_with(cur, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(cur, 1, F.greatest(F.size(toks) - (k - 1), F.lit(0)))


def _sql_windows(toks: str, k: int = SPAN_K) -> str:
    joined = " || ' ' || ".join(f"({toks})[i+{off}]" for off in range(k))
    return (
        f"list_transform("
        f"generate_series(1, greatest(len({toks}) - {k - 1}, 0)), i -> {joined})"
    )


_C93_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         list_filter({sql_tokens('text')}, t -> t <> '') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, greatest(len(toks) - {SPAN_K - 1}, 0) AS n_windows, toks
  FROM base
),
ex AS (
  SELECT doc_id, {sql_hash64('w')} AS wh
  FROM (SELECT doc_id, unnest({_sql_windows('toks')}) AS w
        FROM d WHERE n_windows > 0)
),
dup AS (
  SELECT wh FROM ex GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
),
dup_per_doc AS (
  SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
  FROM ex JOIN dup USING (wh) GROUP BY 1
)
SELECT d.doc_id, CAST(d.n_windows AS BIGINT) AS n_windows,
       COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       {sql_round('COALESCE(p.n_dup_windows, 0) * 1.0'
                  ' / greatest(d.n_windows, 1)', 6)} AS dup_frac
FROM d LEFT JOIN dup_per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


@register("exact_substring_contamination", oracle=_C93_ORACLE)
def exact_substring_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span scoring: for every document, the
    fraction of its {SPAN_K}-token windows whose exact text also
    occurs in ANOTHER document — the ExactSubstr contamination
    measure of Lee et al. 2022 (their suffix-array pass, re-expressed
    as a rolling-window hash join, the shape that distributes).

    Scale shape: windows are a pure map expansion (zip_with shifted
    slices — each token array evaluated once, O(len·k) per doc, never
    O(len²)); the window→hash stream shuffles ONCE on the 64-bit
    window hash for the distinct-doc count, and dup membership comes
    back via a LEFT SEMI join on the same key (no row widening).
    Totals per doc are computed arithmetically from token counts —
    the corpus is never re-scanned for the denominator. Unlike
    dup_span_fraction (within-doc repetition) this measures
    cross-doc duplication; unlike ngram_jaccard (pairwise similarity)
    it needs no pair space at all.
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda t: t != "").alias("toks"),
    )
    d = base.select(
        "doc_id",
        F.greatest(F.size("toks") - (SPAN_K - 1), F.lit(0)).alias("n_windows"),
        "toks",
    )
    # The (doc, window-hash) stream feeds BOTH the dup-hash aggregate
    # and the per-doc semi-join; persist so the O(len·k) expansion and
    # md5 run once (measured 3.6s -> 2.2s warm at sf0.1; at cluster
    # scale this is a MEMORY_AND_DISK frame or a recompute tradeoff).
    ex = (
        d.where(F.col("n_windows") > 0)
        .select("doc_id", F.explode(_windows(F.col("toks"))).alias("w"))
        .select("doc_id", hash64(F.col("w")).alias("wh"))
        .persist()
    )
    dup = (
        ex.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("wh")
    )
    dup_per_doc = (
        ex.join(dup, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        d.select("doc_id", F.col("n_windows").cast("bigint").alias("n_windows"))
        .join(dup_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias(
                "n_dup_windows"
            ),
            round_eps(
                F.coalesce("n_dup_windows", F.lit(0))
                / F.greatest("n_windows", F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
