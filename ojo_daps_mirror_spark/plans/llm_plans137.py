"""Hundred-thirty-seventh sweep (SURVEY.md §2 B253, C223-C224).

ANOVA effect sizes (eta^2 / omega^2 / Cohen's f — B-track ANOVA and
its p-value say WHETHER priorities differ; at corpus n everything is
'significant', and these say whether anyone should CARE), a blocking
quality evaluation (reduction ratio vs pair completeness of the
sorted-neighbourhood blocker against exact-duplicate ground truth —
the two numbers every blocking scheme trades against each other), and
a memorization-risk audit (documents that are BOTH duplicated and
carry globally-unique trigrams — repetition teaches the model exactly
the content that identifies a single record; dedup triage ranked by
who leaks most).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import attach_scalars
from ..operators.rank import global_order_stats
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B253

_B253_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
per_g AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
  FROM samp GROUP BY g
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(sx) AS BIGINT) AS tsx,
         SUM(sxx) AS tsxx,
         SUM(CAST(sx AS DOUBLE) * sx / ng) AS sgm
  FROM per_g
),
ss AS (
  SELECT k, n,
         sgm - CAST(tsx AS DOUBLE) * tsx / n AS ssb,
         tsxx - sgm AS ssw,
         tsxx - CAST(tsx AS DOUBLE) * tsx / n AS sst
  FROM tot
)
SELECT k, n,
       {sql_round('ssb / sst', 6)} AS eta_squared,
       {sql_round(
           '(ssb - (k - 1.0) * (ssw / (n - k))) / (sst + ssw / (n - k))',
           6)} AS omega_squared,
       {sql_round('sqrt((ssb / sst) / (1.0 - ssb / sst))', 6)}
         AS cohens_f,
       CASE WHEN ssb / sst >= 0.14 THEN 'large'
            WHEN ssb / sst >= 0.06 THEN 'medium'
            WHEN ssb / sst >= 0.01 THEN 'small'
            ELSE 'negligible' END AS magnitude
FROM ss
"""


@register("anova_effect_sizes", oracle=_B253_ORACLE)
def anova_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes for the priority ANOVA — eta^2 (variance share
    explained), omega^2 (its small-sample-unbiased correction) and
    Cohen's f, with the conventional magnitude label. The missing
    half of anova_oneway: at corpus n the F-test rejects for
    trivia (see also B-track power planning), and the effect size is
    what separates 'statistically detectable' from 'operationally
    real'. All three derive from the same two sums of squares.

    Exactness: per-group moments are exact 128-bit integers; the SS
    decomposition and ratios are one double tree.

    Scale shape: ONE map-side-combinable fact aggregate to 5 rows,
    one reduction — free at any scale.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("x"),
    )
    dec = "decimal(38,0)"
    per_g = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("sxx"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("tsx"),
        F.sum("sxx").alias("tsxx"),
        F.sum(F.col("sx").cast("double") * F.col("sx") / F.col("ng"))
        .alias("sgm"),
    )
    ssb = F.col("sgm") - F.col("tsx").cast("double") * F.col("tsx") / F.col(
        "n"
    )
    ssw = F.col("tsxx") - F.col("sgm")
    sst = F.col("tsxx") - F.col("tsx").cast("double") * F.col("tsx") / F.col(
        "n"
    )
    mse = ssw / (F.col("n") - F.col("k"))
    eta2 = ssb / sst
    omega2 = (ssb - (F.col("k") - 1.0) * mse) / (sst + mse)
    return tot.select(
        "k",
        "n",
        round_eps(eta2, 6).alias("eta_squared"),
        round_eps(omega2, 6).alias("omega_squared"),
        round_eps(F.sqrt(eta2 / (1.0 - eta2)), 6).alias("cohens_f"),
        F.when(eta2 >= 0.14, "large")
        .when(eta2 >= 0.06, "medium")
        .when(eta2 >= 0.01, "small")
        .otherwise("negligible")
        .alias("magnitude"),
    )


# ---------------------------------------------------------------- C223

BQ_WINDOW = 3  # sorted-neighbourhood window (compare i with i+1..i+w)

_C223_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         md5(substr(text, 1, 40)) AS dup_key,
         CAST(ROW_NUMBER() OVER (ORDER BY substr(text, 1, 12), doc_id)
              AS BIGINT) AS pos
  FROM documents
),
truth AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM keyed a JOIN keyed b
    ON a.dup_key = b.dup_key AND a.doc_id < b.doc_id
),
cand AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS d1,
         GREATEST(a.doc_id, b.doc_id) AS d2
  FROM keyed a JOIN keyed b
    ON b.pos - a.pos BETWEEN 1 AND {BQ_WINDOW}
),
tot AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keyed) AS n,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM truth t JOIN cand c ON t.d1 = c.d1 AND t.d2 = c.d2)
           AS covered
)
SELECT n AS n_docs, n_truth AS true_dup_pairs,
       n_cand AS candidate_pairs, covered,
       {sql_round(
           '1.0 - CAST(n_cand AS DOUBLE)'
           ' / (CAST(n AS DOUBLE) * (n - 1) / 2)', 6)}
         AS reduction_ratio,
       {sql_round('CAST(covered AS DOUBLE) / NULLIF(n_truth, 0)', 6)}
         AS pair_completeness,
       {sql_round(
           '2.0 * (1.0 - CAST(n_cand AS DOUBLE)'
           '       / (CAST(n AS DOUBLE) * (n - 1) / 2))'
           ' * (CAST(covered AS DOUBLE) / NULLIF(n_truth, 0))'
           ' / ((1.0 - CAST(n_cand AS DOUBLE)'
           '     / (CAST(n AS DOUBLE) * (n - 1) / 2))'
           '    + CAST(covered AS DOUBLE) / NULLIF(n_truth, 0))', 6)}
         AS blocking_f1
FROM tot
"""


@register("blocking_quality_eval", oracle=_C223_ORACLE)
def blocking_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking quality of the sorted-neighbourhood scheme against
    exact-duplicate ground truth: REDUCTION RATIO (fraction of the
    all-pairs space the blocker never looks at) vs PAIR COMPLETENESS
    (fraction of true duplicate pairs the window still covers), plus
    their harmonic mean. sorted_neighborhood_dedup RUNS the blocker;
    this EVALUATES it — the two numbers every blocking design trades
    (wider window: PC up, RR down), measured instead of assumed.
    Truth = the A10 prefix-key duplicate pairs; blocker = sort by
    12-char text prefix, window {BQ_WINDOW}.

    Exactness: positions, pair sets and intersections are exact
    integer sets with total-order tiebreaks; three ratios.

    Scale shape: one global sort for positions (the blocker's own
    cost), a bounded-band self-join for candidates, key-grain join
    for truth — the evaluation costs what the blocker costs.
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.substring(F.col("text"), 1, 40)).alias("dup_key"),
        F.substring(F.col("text"), 1, 12).alias("sort_key"),
    )
    # blocker positions via the range-partitioned global rank — no
    # single-reducer window over the corpus (operators/rank.py).
    keyed = global_order_stats(
        base, ["sort_key", "doc_id"], rn_col="pos"
    ).select("doc_id", "dup_key", "pos")
    keyed = keyed.persist()
    a = keyed.alias("a")
    b = keyed.alias("b")
    truth = a.join(
        b,
        (F.col("a.dup_key") == F.col("b.dup_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
    )
    # Banded self-join via BLOCK KEYS, not a non-equi nested loop:
    # b.pos in [a.pos+1, a.pos+W] implies b's block (pos div W) is
    # a's block or a's block + 1, so explode each left row into its
    # two probe blocks, equi-join on the block, and re-check the
    # exact band — O(n * W) pairs through a hash/sort-merge join.
    blk = (F.col("pos") / BQ_WINDOW).cast("bigint")
    a_blk = keyed.select(
        F.col("doc_id").alias("a_id"),
        F.col("pos").alias("a_pos"),
        F.explode(F.array(blk, blk + 1)).alias("blk"),
    )
    b_blk = keyed.select(
        F.col("doc_id").alias("b_id"),
        F.col("pos").alias("b_pos"),
        blk.alias("blk"),
    )
    cand = (
        a_blk.join(b_blk, "blk")
        .where((F.col("b_pos") - F.col("a_pos")).between(1, BQ_WINDOW))
        .select(
            F.least(F.col("a_id"), F.col("b_id")).alias("d1"),
            F.greatest(F.col("a_id"), F.col("b_id")).alias("d2"),
        )
    )
    cand = cand.persist()
    n = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth")
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    covered = truth.join(cand, ["d1", "d2"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("covered")
    )
    tot = attach_scalars(
        attach_scalars(attach_scalars(n, n_truth), n_cand), covered
    )
    nd = F.col("n").cast("double")
    rr = 1.0 - F.col("n_cand").cast("double") / (nd * (F.col("n") - 1) / 2)
    pc = F.col("covered").cast("double") / F.nullif(
        F.col("n_truth"), F.lit(0)
    )
    return tot.select(
        F.col("n").alias("n_docs"),
        F.col("n_truth").alias("true_dup_pairs"),
        F.col("n_cand").alias("candidate_pairs"),
        "covered",
        round_eps(rr, 6).alias("reduction_ratio"),
        round_eps(pc, 6).alias("pair_completeness"),
        round_eps(2.0 * rr * pc / (rr + pc), 6).alias("blocking_f1"),
    )


# ---------------------------------------------------------------- C224

MR_TOP = 10

_C224_ORACLE = f"""
WITH comp AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40)))
           AS component_id,
         COUNT(*) OVER (PARTITION BY md5(substr(text, 1, 40)))
           AS group_size
  FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts
  FROM documents
),
tg AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]
           AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
),
rare AS (
  SELECT g FROM tg GROUP BY g HAVING COUNT(*) = 1
),
doc_rare AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_unique_trigrams
  FROM tg t JOIN rare r USING (g)
  GROUP BY t.doc_id
),
scored AS (
  SELECT c.doc_id, c.component_id,
         CAST(c.group_size AS BIGINT) AS group_size,
         COALESCE(d.n_unique_trigrams, 0) AS n_unique_trigrams,
         CAST((c.group_size - 1) * COALESCE(d.n_unique_trigrams, 0)
              AS BIGINT) AS risk
  FROM comp c LEFT JOIN doc_rare d USING (doc_id)
  WHERE c.group_size > 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY risk DESC, doc_id) AS rk
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rank, doc_id, component_id, group_size,
       CAST(n_unique_trigrams AS BIGINT) AS n_unique_trigrams, risk
FROM ranked WHERE rk <= {MR_TOP}
ORDER BY rank
"""


@register("memorization_risk_audit", oracle=_C224_ORACLE)
def memorization_risk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk triage: documents that are BOTH duplicated
    (multi-member A10 prefix-key components — the model sees them
    repeatedly) AND carry globally-UNIQUE trigrams (content that
    identifies a single record — the stand-in for PII in this
    corpus). Repetition times uniqueness is the memorization recipe
    (Carlini et al.'s extraction work: duplicated rare strings are
    what models regurgitate), so risk = (group_size - 1) *
    unique-trigram count, top-{MR_TOP} worst. dedup (A10-A12)
    removes repetition and pii_scrub removes identifiers; this ranks
    which documents need them MOST, composing both signals.

    Exactness: components, singleton-trigram counts and the risk
    product are exact integers; ranking tiebreak is total.

    Scale shape: the A10 window for components, one (doc, trigram)
    distinct frame, a singleton semi-join — every piece map-side or
    one shuffle, all shared with existing pipelines.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.substring(F.col("text"), 1, 40))
    comp = docs.select(
        "doc_id",
        F.min("doc_id")
        .over(Window.partitionBy(key))
        .alias("component_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy(key))
        .cast("bigint")
        .alias("group_size"),
    )
    tg = (
        docs.select(
            "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("ts")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 2, 0)),"
                    " (x, i) -> concat(x, ' ', ts[i + 1], ' ', ts[i + 2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    tg = tg.persist()
    rare = (
        tg.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") == 1)
        .select("g")
    )
    doc_rare = (
        tg.join(rare, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique_trigrams"))
    )
    scored = (
        comp.where(F.col("group_size") > 1)
        .join(doc_rare, "doc_id", "left")
        .select(
            "doc_id",
            "component_id",
            "group_size",
            F.coalesce(F.col("n_unique_trigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_unique_trigrams"),
        )
        .withColumn(
            "risk",
            ((F.col("group_size") - 1) * F.col("n_unique_trigrams"))
            .cast("bigint"),
        )
    )
    # Global top-N via orderBy+limit (TakeOrderedAndProject: bounded
    # per-partition top-N + merge), then rank over the N-row frame —
    # no unpartitioned window over doc grain.
    top = scored.orderBy(F.col("risk").desc(), "doc_id").limit(MR_TOP)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("risk").desc(), "doc_id"))
        .cast("bigint")
        .alias("rank"),
        "doc_id",
        "component_id",
        "group_size",
        "n_unique_trigrams",
        "risk",
    ).orderBy("rank")
