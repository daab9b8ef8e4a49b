"""Ninetieth sweep (SURVEY.md §2 B166-B167, C165).

Bowker symmetry test on the user-journey transition matrix (is
A -> B as likely as B -> A — the reversibility question B46's
row-normalised matrix displays but never tests), the Lorenz decile
table (the curve BEHIND B81's single Gini number — which decile
actually carries the revenue), and character-level entropy per
source (the bits-per-char compression floor — C161's question one
level down, and the storage-planning number for a text lake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import attach_scalars
from ..operators.rank import global_order_stats, ntile_from_rank
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B166

_B166_ORACLE = f"""
WITH seq AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b
  FROM events
),
trans AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE b IS NOT NULL GROUP BY a, b
),
pairs AS (
  SELECT f.a AS i, f.b AS j,
         f.n AS n_ij, COALESCE(r.n, 0) AS n_ji
  FROM trans f LEFT JOIN trans r ON f.a = r.b AND f.b = r.a
  WHERE f.a < f.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(n_ij + n_ji) AS BIGINT) AS n_offdiag,
       {sql_round(
           'SUM((n_ij - n_ji) * (n_ij - n_ji) * 1.0 / (n_ij + n_ji))',
           6)} AS bowker_chi2
FROM pairs WHERE n_ij + n_ji > 0
"""


@register("bowker_symmetry_test", oracle=_B166_ORACLE)
def bowker_symmetry_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker test of symmetry on the user-journey transition
    counts: chi2 = sum over unordered type pairs of
    (n_ij - n_ji)^2 / (n_ij + n_ji), df = #pairs observed — the
    formal test of whether journeys are REVERSIBLE (view <-> click
    symmetric) or directed (signup -> purchase a one-way street),
    which B46's row-normalised matrix shows but never tests.

    Exactness: transition counts are exact BIGINTs over the
    deterministic (ts, event_id) event order (B46's convention);
    the matrix-vs-transpose match is a self-join of the
    |types|^2-cell frame; one double division per pair.

    Scale shape: one user-partitioned lead window at fact grain
    (the sessionize family's shuffle), one aggregate to <=25 cells,
    dimension-scale everything after.
    """
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("b"),
    )
    trans = (
        seq.where(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    trans = trans.persist()
    fwd = trans.select(
        F.col("a").alias("i"), F.col("b").alias("j"), F.col("n").alias("n_ij")
    )
    rev = trans.select(
        F.col("b").alias("i"), F.col("a").alias("j"), F.col("n").alias("n_ji")
    )
    pairs = (
        fwd.join(F.broadcast(rev), ["i", "j"], "left")
        .where(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            "n_ij",
            F.coalesce(F.col("n_ji"), F.lit(0)).alias("n_ji"),
        )
    )
    tot = F.col("n_ij") + F.col("n_ji")
    return pairs.where(tot > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(tot).cast("bigint").alias("n_offdiag"),
        round_eps(
            F.sum(
                (F.col("n_ij") - F.col("n_ji"))
                * (F.col("n_ij") - F.col("n_ji"))
                * 1.0
                / tot
            ),
            6,
        ).alias("bowker_chi2"),
    )


# ---------------------------------------------------------------- B167

_B167_ORACLE = f"""
WITH cust AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
deciled AS (
  SELECT rev, NTILE(10) OVER (ORDER BY rev, c) AS decile FROM cust
),
per_dec AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS BIGINT) AS r
  FROM deciled GROUP BY decile
),
cum AS (
  SELECT decile, n, r,
         CAST(SUM(n) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cn,
         CAST(SUM(r) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cr,
         CAST(SUM(n) OVER () AS BIGINT) AS tn,
         CAST(SUM(r) OVER () AS BIGINT) AS tr
  FROM per_dec
)
SELECT decile, n AS n_customers,
       {sql_round('r / 100.0', 2)} AS revenue,
       {sql_round('cn * 100.0 / tn', 4)} AS cum_pop_share_pct,
       {sql_round('cr * 100.0 / tr', 4)} AS cum_rev_share_pct
FROM cum ORDER BY decile
"""


@register("lorenz_deciles", oracle=_B167_ORACLE)
def lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind B81's Gini, tabulated at customer
    deciles (poorest first): cumulative population share vs
    cumulative revenue share — the dashboard table that says WHICH
    decile carries the money (the bottom half's share, the top
    decile's share) where the Gini compresses it all to one number.

    Exactness: revenue is exact cents; decile assignment is NTILE
    over the deterministic (revenue, custkey) total order — both
    engines put the remainder rows in the earlier buckets, so the
    assignment is identical; cumulative shares are exact integer
    ratios.

    Scale shape: one fact aggregate to customer grain, one global
    NTILE window over customer-grain rows (a sort, the op's honest
    cost), then |deciles|-row windows.
    """
    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    from ..operators.lineage import cut_lineage

    # Customer-grain frame feeds the count scalar AND the global-rank
    # pass; materialize it once so neither branch replays the fact
    # aggregate (plan: 22 Exchange with duplicated orders subtrees).
    cust = cut_lineage(cust)
    # Decile assignment from the range-partitioned global rank +
    # the exact NTILE closed form — no unpartitioned NTILE window
    # over the customer-grain frame (operators/rank.py).
    n_tot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    ranked = global_order_stats(cust, ["rev", "c"], rn_col="rn")
    deciled = attach_scalars(ranked, n_tot).select(
        "rev",
        ntile_from_rank(F.col("rn"), F.col("n_tot"), 10).alias("decile"),
    )
    per_dec = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev").cast("bigint").alias("r"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = per_dec.select(
        "decile",
        "n",
        "r",
        F.sum("n").over(w_cum).cast("bigint").alias("cn"),
        F.sum("r").over(w_cum).cast("bigint").alias("cr"),
        F.sum("n").over(w_all).cast("bigint").alias("tn"),
        F.sum("r").over(w_all).cast("bigint").alias("tr"),
    )
    return cum.select(
        "decile",
        F.col("n").alias("n_customers"),
        round_eps(F.col("r") / 100.0, 2).alias("revenue"),
        round_eps(F.col("cn") * 100.0 / F.col("tn"), 4).alias(
            "cum_pop_share_pct"
        ),
        round_eps(F.col("cr") * 100.0 / F.col("tr"), 4).alias(
            "cum_rev_share_pct"
        ),
    ).orderBy("decile")


# ---------------------------------------------------------------- C165

_C165_ORACLE = f"""
WITH chars AS (
  SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source,
           unnest(list_transform(generate_series(1, len(text)),
                                 i -> text[i])) AS ch
    FROM documents
  ) GROUP BY source, ch
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM chars GROUP BY 1)
SELECT chars.source AS source,
       CAST(t AS BIGINT) AS n_chars,
       CAST(COUNT(*) AS BIGINT) AS distinct_chars,
       {sql_round(
           '-SUM((c * 1.0 / t) * log2(c * 1.0 / t))', 6)}
         AS h_bits_per_char,
       {sql_round(
           '8.0 / (-SUM((c * 1.0 / t) * log2(c * 1.0 / t)))', 4)}
         AS ascii_compression_ratio
FROM chars JOIN tot USING (source)
GROUP BY chars.source, t ORDER BY source
"""


@register("char_entropy", oracle=_C165_ORACLE)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level entropy per source: bits per character of the
    unigram char distribution and the implied compression ratio
    against 8-bit ASCII — the model-free storage floor (an order-0
    arithmetic coder achieves exactly this), C161's predictability
    question asked at the character level, and the capacity input
    for text-lake storage planning.

    Scale shape: one character explode (len(text) rows per doc —
    the op's honest grain) into a (source, char) aggregate whose
    key space is tiny (|alphabet| per source); entropy sums run at
    alphabet grain.
    """
    chars = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text)),"
                    " i -> substring(text, i, 1))"
                )
            ).alias("ch"),
        )
        .groupBy("source", "ch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = chars.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    joined = chars.join(tot, "source")
    p = F.col("c") * 1.0 / F.col("t")
    return (
        joined.groupBy("source", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
            round_eps((-F.sum(p * F.log2(p))), 6).alias(
                "h_bits_per_char"
            ),
            round_eps(
                8.0 / (-F.sum(p * F.log2(p))), 4
            ).alias("ascii_compression_ratio"),
        )
        .select(
            "source",
            F.col("t").cast("bigint").alias("n_chars"),
            "distinct_chars",
            "h_bits_per_char",
            "ascii_compression_ratio",
        )
        .orderBy("source")
    )
