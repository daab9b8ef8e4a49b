"""Fifty-seventh sweep (SURVEY.md §2 B110, C122-C123).

Calibration reliability diagram + Brier score (the probability-quality
eval B103's PAVA repairs toward), effective-sample-size diagnostics
over C92's DSIR importance weights, and frequent 3-sequence mining
(PrefixSpan level 2, extending C84's pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_hash64
from ..functions.text import hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .llm_plans33 import _C92_ORACLE

# ---------------------------------------------------------------- B110

CAL_BINS = 10

_B110_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST({sql_hash64("user_id::VARCHAR || ':score'")} % 100000
              AS BIGINT) AS s5,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
binned AS (
  SELECT LEAST(s5 * {CAL_BINS} // 100000, {CAL_BINS - 1}) AS bin,
         s5, y, (s5 - 100000 * y) * (s5 - 100000 * y) AS sq10
  FROM users
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(sq10) AS BIGINT) AS sq_sum
  FROM binned
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('SUM(s5) * 1.0 / COUNT(*) / 100000', 6)} AS mean_pred,
       {sql_round('SUM(y) * 1.0 / COUNT(*)', 6)} AS observed,
       {sql_round(
           'SUM(s5) * 1.0 / COUNT(*) / 100000 - SUM(y) * 1.0 / COUNT(*)',
           6)} AS gap,
       {sql_round('tot.sq_sum * 1.0 / tot.n_users / 1e10', 6)} AS brier
FROM binned CROSS JOIN tot
GROUP BY bin, tot.sq_sum, tot.n_users ORDER BY bin
"""


@register("calibration_reliability", oracle=_B110_ORACLE)
def calibration_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score for the propensity stub
    (B64's score) against observed conversion: per score bin the mean
    prediction, observed rate and calibration gap, plus the overall
    Brier score — the probability-quality eval whose violations B103's
    PAVA repairs (a model can rank perfectly — B64 lift — and still be
    miscalibrated; this is the diagram that shows it).

    Scale shape: users collapse to one row each in a single
    aggregate; scores are EXACT k/100000 rationals, so bin means are
    integer sums and the Brier numerator Σ(k−100000·y)² is exact
    bigint arithmetic — the 1-row total attaches as a broadcast
    scalar.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("y")
        )
        .select(
            (
                hash64(F.concat(F.col("user_id").cast("string"), F.lit(":score")))
                % 100000
            ).alias("s5"),
            "y",
        )
    )
    binned = users.select(
        F.least(
            F.floor(F.col("s5") * CAL_BINS / 100000).cast("bigint"),
            F.lit(CAL_BINS - 1),
        ).alias("bin"),
        "s5",
        "y",
        ((F.col("s5") - 100000 * F.col("y")) * (F.col("s5") - 100000 * F.col("y"))).alias(
            "sq10"
        ),
    )
    tot = binned.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("sq10").cast("bigint").alias("sq_sum"),
    )
    return (
        binned.transform(scalars(tot))
        .groupBy("bin", "sq_sum", "n_users")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.sum("s5") * 1.0 / F.count(F.lit(1)) / 100000, 6).alias(
                "mean_pred"
            ),
            round_eps(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias(
                "observed"
            ),
            round_eps(
                F.sum("s5") * 1.0 / F.count(F.lit(1)) / 100000
                - F.sum("y") * 1.0 / F.count(F.lit(1)),
                6,
            ).alias("gap"),
        )
        .select(
            "bin",
            "n",
            "mean_pred",
            "observed",
            "gap",
            round_eps(
                F.col("sq_sum") * 1.0 / F.col("n_users") / 1e10, 6
            ).alias("brier"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------- C122

_C122_ORACLE = f"""
WITH c92 AS ({_C92_ORACLE}),
weighted AS (
  SELECT d.source,
         CAST(ROUND(exp(c92.logw) * 1e6) AS BIGINT) AS w6
  FROM c92 JOIN documents d USING (doc_id)
),
suff AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w6) AS BIGINT) AS sw,
         CAST(SUM((w6 // 1000) * (w6 // 1000)) AS BIGINT) AS sw2k
  FROM weighted GROUP BY source
)
SELECT source, n_docs,
       {sql_round('sw * 1.0 * sw / (sw2k * 1e6)', 4)} AS ess,
       {sql_round('sw * 1.0 * sw / (sw2k * 1e6) / n_docs', 6)} AS ess_ratio
FROM suff ORDER BY source
"""


@register("importance_weight_ess", oracle=_C122_ORACLE)
def importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size ESS = (Σw)²/Σw² of C92's DSIR importance
    weights, per source — the importance-sampling health check (an
    ESS ratio near 1 means the reweighted source behaves like its
    full size; near 0 means a few documents dominate and the
    resampled mixture has collapsed). The diagnostic every
    importance-weighted pipeline reports next to the weights
    themselves; the oracle EMBEDS C92's oracle verbatim so weights
    and diagnostic can never drift (the C63 recipe).

    Scale shape: `source` is functionally dependent on doc_id, so it
    rides C92's own (doc, bucket) aggregate (_dsir_scored's carry
    columns) instead of joining C92's doc-grain output back to the
    documents table — the former doc-grain equi-join (two full-corpus
    shuffles + a sort) is gone outright (guide §2.4); then one
    source-grain aggregate. Weights quantise to integer micro-units
    (and milli-units squared, keeping Σw² inside BIGINT) so both
    engines reduce exact integers.
    """
    from .llm_plans33 import _dsir_scored

    weighted = _dsir_scored(spark, sf_dir, carry=("source",)).select(
        "source",
        F.round(F.exp("logw") * 1e6).cast("bigint").alias("w6"),
    )
    suff = weighted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w6").cast("bigint").alias("sw"),
        F.sum(
            F.floor(F.col("w6") / 1000).cast("bigint")
            * F.floor(F.col("w6") / 1000).cast("bigint")
        )
        .cast("bigint")
        .alias("sw2k"),
    )
    ess = F.col("sw") * 1.0 * F.col("sw") / (F.col("sw2k") * 1e6)
    return suff.select(
        "source",
        "n_docs",
        round_eps(ess, 4).alias("ess"),
        round_eps(ess / F.col("n_docs"), 6).alias("ess_ratio"),
    ).orderBy("source")


# ---------------------------------------------------------------- C123

SEQ3_MIN_SUPPORT = 0.05  # fraction of users

_C123_ORACLE = f"""
WITH firsts AS (
  SELECT user_id, event_type,
         MIN(struct_pack(ts := ts, eid := event_id)) AS fo
  FROM events GROUP BY 1, 2
),
seqs AS (
  SELECT user_id,
         list(event_type ORDER BY fo.ts, fo.eid) AS seq
  FROM firsts GROUP BY user_id
),
triples AS (
  SELECT user_id, seq[a.i] AS t1, seq[b.j] AS t2, seq[c.k] AS t3
  FROM seqs,
       unnest(generate_series(1, len(seq))) AS a(i),
       unnest(generate_series(1, len(seq))) AS b(j),
       unnest(generate_series(1, len(seq))) AS c(k)
  WHERE a.i < b.j AND b.j < c.k
),
counts AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM triples GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM seqs)
SELECT t1, t2, t3, n_users,
       {sql_round('n_users * 1.0 / tot.nu', 6)} AS support
FROM counts CROSS JOIN tot
WHERE n_users * 1.0 / tot.nu >= {SEQ3_MIN_SUPPORT}
ORDER BY n_users DESC, t1, t2, t3
"""


@register("sequence_mining_3seq", oracle=_C123_ORACLE)
def sequence_mining_3seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-sequences over per-user FIRST-OCCURRENCE orderings
    (PrefixSpan level 2 — C84's 2-sequences extended one level, with
    a support floor): which ordered type triples ≥{SEQ3_MIN_SUPPORT:.0%}
    of users traverse — the pattern pool funnel definitions (B21/B86)
    are mined FROM.

    Scale shape: users reduce to ≤|types| first-occurrence rows in ONE
    aggregate, each user's ordered type array expands its ≤C(|types|,3)
    triples MAP-SIDE (bounded by the type vocabulary, not event
    volume), then a |types|³-key combined count + broadcast user
    total.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", F.col("event_id").alias("eid"))).alias("fo")
    )
    seqs = firsts.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("fo.ts").alias("ts"),
                        F.col("fo.eid").alias("eid"),
                        F.col("event_type").alias("et"),
                    )
                )
            ),
            lambda s: s["et"],
        ).alias("seq")
    )
    s = F.col("seq")
    triples = F.flatten(
        F.transform(
            s,
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(s, i + F.lit(2), F.size(s)),
                    lambda y, j: F.transform(
                        F.slice(s, i + j + F.lit(3), F.size(s)),
                        lambda z: F.struct(
                            x.alias("t1"), y.alias("t2"), z.alias("t3")
                        ),
                    ),
                )
            ),
        )
    )
    counts = (
        seqs.select(F.explode(triples).alias("t"))
        .groupBy(
            F.col("t.t1").alias("t1"),
            F.col("t.t2").alias("t2"),
            F.col("t.t3").alias("t3"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    tot = seqs.agg(F.count(F.lit(1)).alias("nu"))
    support = F.col("n_users") * 1.0 / F.col("nu")
    return (
        counts.transform(scalars(tot))
        .where(support >= SEQ3_MIN_SUPPORT)
        .select(
            "t1",
            "t2",
            "t3",
            "n_users",
            round_eps(support, 6).alias("support"),
        )
        .orderBy(F.desc("n_users"), "t1", "t2", "t3")
    )
