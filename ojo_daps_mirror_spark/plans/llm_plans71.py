"""Seventy-first sweep (SURVEY.md §2 B130, C144-C145).

Markov entropy rate of the user-journey chain (how predictable is the
next step — the one-number summary of B members' transition matrix),
OOV rate per source against a frequency vocabulary (the
tokenizer-coverage check that decides whether C30/C44's vocab
transfers to a new source), and rank-biased overlap between two term
rankings (the IR-standard top-weighted list-similarity — do frequency
and rarity-weighted rankings agree on what a source is about?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B130

_B130_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
cells AS (
  SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS c
  FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2
),
rows_ AS (
  SELECT src, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY src
),
row_h AS (
  SELECT c.src, r.r,
         -SUM((c.c * 1.0 / r.r) * ln(c.c * 1.0 / r.r)) AS h
  FROM cells c JOIN rows_ r USING (src) GROUP BY c.src, r.r
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t FROM rows_)
SELECT CAST(MAX(tot.t) AS BIGINT) AS n_transitions,
       {sql_round('SUM(row_h.r * row_h.h) / MAX(tot.t)', 6)}
         AS entropy_rate,
       {sql_round('SUM(row_h.r * row_h.h) / MAX(tot.t) / ln(5.0)', 6)}
         AS normalized
FROM row_h CROSS JOIN tot
"""


@register("journey_entropy_rate", oracle=_B130_ORACLE)
def journey_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the user-journey Markov chain:
    H = Σᵢ wᵢ·H(rowᵢ) over B-track's transition matrix, with weights
    the empirical visit shares — 0 means the next step is determined,
    ln(5) means the journey is a coin flip over the 5 event types.
    The one-number predictability summary of the transition matrix
    (B68) that decides whether sequence models (C84/C123 mining,
    B67's funnels) have any signal to find.

    Scale shape: one per-user LEAD window (the standard journey
    shuffle), a ≤25-cell transition aggregate, and all entropy
    arithmetic on that dimension-scale frame.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = load_table(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    cells = (
        ordered.where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cells = cells.persist()
    rows_ = cells.groupBy("src").agg(F.sum("c").cast("bigint").alias("r"))
    row_h = (
        cells.join(F.broadcast(rows_), "src")
        .groupBy("src", "r")
        .agg(
            (
                -F.sum(
                    (F.col("c") * 1.0 / F.col("r"))
                    * F.log(F.col("c") * 1.0 / F.col("r"))
                )
            ).alias("h")
        )
    )
    tot = rows_.agg(F.sum("r").cast("bigint").alias("t"))
    return row_h.transform(scalars(tot)).agg(
        F.max("t").cast("bigint").alias("n_transitions"),
        round_eps(
            F.sum(F.col("r") * F.col("h")) / F.max("t"), 6
        ).alias("entropy_rate"),
        round_eps(
            F.sum(F.col("r") * F.col("h"))
            / F.max("t")
            / float(__import__("math").log(5.0)),
            6,
        ).alias("normalized"),
    )


# ---------------------------------------------------------------- C144

OOV_VOCAB_SIZE = 400

_C144_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
clean AS (SELECT doc_id, source, tok FROM toks WHERE tok <> ''),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM clean WHERE doc_id % 2 = 0 GROUP BY tok
  ) WHERE rk <= {OOV_VOCAB_SIZE}
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       {sql_round(
           'SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)',
           6)} AS oov_rate
FROM clean c LEFT JOIN vocab v ON c.tok = v.tok
GROUP BY c.source ORDER BY c.source
"""


@register("oov_rate_by_source", oracle=_C144_ORACLE)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against a top-400 frequency
    vocabulary built on the even-doc-id training half — the
    tokenizer-coverage check run before reusing C30/C44's vocabulary
    on a new source (a high-OOV source fragments into rare tokens,
    blows up sequence lengths and starves C70's masking of real
    words; this is the number that triggers a vocab rebuild).

    Scale shape: one token-grain aggregate builds the vocab (rank
    window on the |vocab| frame only), the vocab broadcasts as a
    LEFT-join probe against the token stream, and the per-source
    rates reduce map-side. At 100 TB the vocab is a build artifact
    reused across audits, not rebuilt per query.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    toks = toks.persist()
    vocab = (
        toks.where(F.col("doc_id") % 2 == 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok")),
        )
        .where(F.col("rk") <= OOV_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            round_eps(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- C145

RBO_P = 0.9
RBO_DEPTH = 10

_C145_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY 1, 2
),
df AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS gf FROM tf GROUP BY tok),
scored AS (
  SELECT t.source, t.tok, t.tf, (t.tf * 1000000) // d.gf AS qscore
  FROM tf t JOIN df d USING (tok)
),
ranked AS (
  SELECT source, tok,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY tf DESC, tok) AS ra,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY qscore DESC, tok) AS rb
  FROM scored
),
common AS (
  SELECT source, GREATEST(ra, rb) AS deep
  FROM ranked WHERE ra <= {RBO_DEPTH} AND rb <= {RBO_DEPTH}
),
depths AS (
  SELECT r.source, d.d,
         CAST(COUNT(*) FILTER (WHERE c.deep <= d.d) AS BIGINT) AS overlap
  FROM (SELECT DISTINCT source FROM ranked) r
  CROSS JOIN (SELECT unnest(generate_series(1, {RBO_DEPTH})) AS d) d
  LEFT JOIN common c ON c.source = r.source
  GROUP BY r.source, d.d
)
SELECT source,
       CAST(MAX(CASE WHEN d = {RBO_DEPTH} THEN overlap END) AS BIGINT)
         AS overlap_at_10,
       {sql_round(
           f'SUM((1 - {RBO_P}) * POWER({RBO_P}, d - 1) * overlap / d)'
           f' + POWER({RBO_P}, {RBO_DEPTH})'
           f' * MAX(CASE WHEN d = {RBO_DEPTH} THEN overlap END)'
           f' * 1.0 / {RBO_DEPTH}', 6)} AS rbo
FROM depths GROUP BY source ORDER BY source
"""


@register("rank_overlap_rbo", oracle=_C145_ORACLE)
def rank_overlap_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, RBO_EXT truncated at
    depth 10, p=0.9) between two term rankings per source — raw
    frequency vs rarity-weighted (tf·10⁶/global-freq in EXACT integer
    division, so both engines rank identically) — the IR-standard
    top-weighted list similarity, convergent where Kendall's τ treats
    rank 1 and rank 1000 disagreements alike. Low RBO = the source's
    characteristic terms differ from its merely-frequent ones (a
    boilerplate smell that C132's c-TF-IDF then names).

    Scale shape: one (source, token) aggregate, global frequencies
    derived from those partials, two rank windows per source on the
    class-vocabulary frame, and the depth fan-out is a 10-row
    broadcast grid — everything after the first aggregate is
    dimension-scale.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    tf = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    tf = tf.persist()
    df = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("gf"))
    scored = tf.join(df, "tok").select(
        "source",
        "tok",
        "tf",
        F.floor(F.col("tf") * 1000000 / F.col("gf")).cast("bigint").alias(
            "qscore"
        ),
    )
    wa = Window.partitionBy("source").orderBy(F.col("tf").desc(), "tok")
    wb = Window.partitionBy("source").orderBy(F.col("qscore").desc(), "tok")
    ranked = scored.select(
        "source",
        "tok",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    common = ranked.where(
        (F.col("ra") <= RBO_DEPTH) & (F.col("rb") <= RBO_DEPTH)
    ).select("source", F.greatest("ra", "rb").alias("deep"))
    # Same source set as ranked (gf >= tf >= 1, so the df inner join
    # keeps every tf row), read from the PERSISTED tf frame — deriving
    # it from `ranked` replayed the gf join and BOTH per-source window
    # sorts over the full class vocabulary a second time.
    sources = tf.select("source").distinct()
    depths_dim = spark.range(1, RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    depths = (
        sources.transform(scalars(depths_dim))
        .join(F.broadcast(common), "source", "left")
        .groupBy("source", "d")
        .agg(
            F.sum(
                F.when(F.col("deep") <= F.col("d"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("overlap")
        )
    )
    ov10 = F.max(
        F.when(F.col("d") == RBO_DEPTH, F.col("overlap"))
    )
    return (
        depths.groupBy("source")
        .agg(
            ov10.cast("bigint").alias("overlap_at_10"),
            round_eps(
                F.sum(
                    (1 - RBO_P)
                    * F.pow(F.lit(RBO_P), F.col("d") - 1)
                    * F.col("overlap")
                    / F.col("d")
                )
                + F.pow(F.lit(RBO_P), RBO_DEPTH) * ov10 * 1.0 / RBO_DEPTH,
                6,
            ).alias("rbo"),
        )
        .orderBy("source")
    )
