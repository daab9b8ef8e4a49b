"""Hundred-ninth sweep (SURVEY.md §2 B202, C186-C187).

Shapley-value channel attribution (the coalition-fair split that
completes the attribution family — B52 last-touch, B53 position,
B87 Markov removal; Shapley is the one with the axiomatic fairness
guarantee), the T5 span-corruption planner (expected span counts,
sentinel budget and input/target lengths per source — C46's MLM
masking is BERT's recipe, this is T5's), and Levina-Bickel MLE
intrinsic dimensionality (the NONLINEAR local dimension of the
embedding cloud, next to C164's linear-spectral participation
ratio — ambient 64 dims meaning nothing if points live on a
6-dim manifold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.vectors import dot, norm, sql_cosine
from ..sources import load_table
from . import register
from .vector_plans import QUERY_MOD

# ---------------------------------------------------------------- B202

_SHAP_CH = ("view", "click", "signup")


def _shap_phi_sql(i: int) -> str:
    """Shapley weights for 3 players: 1/3 singletons vs empty,
    1/6 each two-member marginal, 1/3 grand coalition marginal."""
    others = [j for j in range(3) if j != i]

    def r(bits):
        return f"r{''.join(str(b) for b in bits)}"

    def bits_with(on):
        b = [0, 0, 0]
        for j in on:
            b[j] = 1
        return b

    j, k = others
    return (
        f"(1.0/3.0) * ({r(bits_with([i]))} - {r(bits_with([]))})"
        f" + (1.0/6.0) * ({r(bits_with([i, j]))} - {r(bits_with([j]))})"
        f" + (1.0/6.0) * ({r(bits_with([i, k]))} - {r(bits_with([k]))})"
        f" + (1.0/3.0) * ({r(bits_with([i, j, k]))}"
        f" - {r(bits_with([j, k]))})"
    )


_B202_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f0,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f1,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS f2,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
wide AS (
  SELECT {", ".join(
      f"COALESCE(SUM(CASE WHEN f0 = {b0} AND f1 = {b1} AND f2 = {b2}"
      f" THEN conv ELSE 0 END) * 1.0"
      f" / NULLIF(SUM(CASE WHEN f0 = {b0} AND f1 = {b1} AND f2 = {b2}"
      f" THEN 1 ELSE 0 END), 0), 0.0) AS r{b0}{b1}{b2}"
      for b0 in (0, 1) for b1 in (0, 1) for b2 in (0, 1))}
  FROM users
),
phi AS (
  {" UNION ALL ".join(
      f"SELECT '{_SHAP_CH[i]}' AS channel,"
      f" ({_shap_phi_sql(i)}) AS phi FROM wide"
      for i in range(3))}
),
tot AS (SELECT SUM(phi) AS tp FROM phi)
SELECT channel,
       {sql_round('phi', 6)} AS shapley_value,
       {sql_round('phi * 100.0 / tp', 4)} AS share_pct
FROM phi CROSS JOIN tot ORDER BY channel
"""


@register("shapley_attribution", oracle=_B202_ORACLE)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the three pre-purchase
    touchpoint types, with coalition values v(S) = conversion rate
    of users whose exposure set is EXACTLY S (empty cells -> 0):
    each channel's phi averages its marginal contribution over all
    join orders — the axiomatically fair split (efficiency,
    symmetry, dummy) that last-touch (B52), position (B53) and
    Markov removal (B87) each violate in a different way. 2^3
    coalition rates from ONE user-grain aggregate; the weights are
    literals generated from the same Python in both engines.

    Scale shape: one fact-to-user aggregate, one 8-cell pivot, a
    3-row literal-weight combination.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == ch, 1).otherwise(0)
                ).alias(f"f{i}")
                for i, ch in enumerate(_SHAP_CH)
            ],
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    aggs = []
    for b0 in (0, 1):
        for b1 in (0, 1):
            for b2 in (0, 1):
                cond = (
                    (F.col("f0") == b0)
                    & (F.col("f1") == b1)
                    & (F.col("f2") == b2)
                )
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(cond, F.col("conv")).otherwise(0))
                        * 1.0
                        / F.nullif(
                            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
                        ),
                        F.lit(0.0),
                    ).alias(f"r{b0}{b1}{b2}")
                )
    wide = users.agg(*aggs)
    phis = []
    for i, ch in enumerate(_SHAP_CH):
        phis.append(
            wide.select(
                F.lit(ch).alias("channel"),
                F.expr(_shap_phi_sql(i)).alias("phi"),
            )
        )
    phi = phis[0]
    for p in phis[1:]:
        phi = phi.unionAll(p)
    w_all = Window.partitionBy()
    return (
        phi.withColumn("tp", F.sum("phi").over(w_all))
        .select(
            "channel",
            round_eps(F.col("phi"), 6).alias("shapley_value"),
            round_eps(F.col("phi") * 100.0 / F.col("tp"), 4).alias(
                "share_pct"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------- C186

SC_RATE = 0.15  # corruption rate
SC_SPAN = 3.0  # mean span length


_C186_ORACLE = f"""
WITH d AS (
  SELECT source, len(string_split_regex(lower(text), '\\s+')) AS n
  FROM documents
),
plan AS (
  SELECT source, n,
         n * {SC_RATE!r} AS corrupted,
         n * {SC_RATE!r} / {SC_SPAN!r} AS n_spans
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       {sql_round('SUM(corrupted)', 2)} AS exp_corrupted_tokens,
       {sql_round('SUM(n_spans)', 2)} AS exp_spans,
       {sql_round(
           'SUM(n - corrupted + n_spans) / SUM(n)', 6)}
         AS input_len_ratio,
       {sql_round(
           'SUM(corrupted + n_spans + 1) / SUM(n)', 6)}
         AS target_len_ratio
FROM plan GROUP BY source ORDER BY source
"""


@register("span_corruption_plan", oracle=_C186_ORACLE)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption planning per source (corruption rate
    {SC_RATE}, mean span {SC_SPAN}): expected corrupted tokens and
    span count, and the input/target length ratios after sentinel
    insertion (input keeps one sentinel per span; target is spans +
    sentinels + EOS) — the seq2seq budget numbers that size encoder/
    decoder contexts BEFORE C49's packer runs, the T5 counterpart of
    C46's BERT-style masking plan.

    Scale shape: pure map-side length arithmetic per document into
    one |sources|-key aggregate.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n"),
    )
    plan = d.select(
        "source",
        "n",
        (F.col("n") * SC_RATE).alias("corrupted"),
        (F.col("n") * SC_RATE / SC_SPAN).alias("n_spans"),
    )
    return (
        plan.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            round_eps(F.sum("corrupted"), 2).alias("exp_corrupted_tokens"),
            round_eps(F.sum("n_spans"), 2).alias("exp_spans"),
            round_eps(
                F.sum(
                    F.col("n") - F.col("corrupted") + F.col("n_spans")
                )
                / F.sum("n"),
                6,
            ).alias("input_len_ratio"),
            round_eps(
                F.sum(F.col("corrupted") + F.col("n_spans") + 1)
                / F.sum("n"),
                6,
            ).alias("target_len_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- C187

ID_K = 5

_C187_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings),
q AS (SELECT * FROM v
      WHERE vec_id % {QUERY_MOD} = 0
        AND vec_id < {QUERY_MOD} * 64),
scored AS (
  SELECT q.vec_id AS query_id,
         1.0 - {sql_cosine('q.embedding', 'v.embedding')} AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {sql_cosine('q.embedding', 'v.embedding')} DESC,
                    v.vec_id) AS rank
  FROM q JOIN v ON q.vec_id <> v.vec_id
),
topk AS (
  SELECT query_id, rank, dist,
         MAX(CASE WHEN rank = {ID_K} THEN dist END)
           OVER (PARTITION BY query_id) AS rk
  FROM scored WHERE rank <= {ID_K}
),
per_q AS (
  SELECT query_id,
         ({ID_K} - 1.0)
           / SUM(CASE WHEN rank < {ID_K} AND dist > 0
                      THEN ln(rk / dist) ELSE 0 END) AS id_mle
  FROM topk
  GROUP BY query_id
  HAVING SUM(CASE WHEN rank < {ID_K} AND dist > 0
                  THEN ln(rk / dist) ELSE 0 END) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       {sql_round('AVG(id_mle)', 4)} AS mean_intrinsic_dim,
       {sql_round('MIN(id_mle)', 4)} AS min_intrinsic_dim,
       {sql_round('MAX(id_mle)', 4)} AS max_intrinsic_dim
FROM per_q
"""


@register("intrinsic_dim_mle", oracle=_C187_ORACLE)
def intrinsic_dim_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levina-Bickel MLE intrinsic dimensionality of the embedding
    cloud at k = {ID_K}, on the standard query subset: per point,
    id = (k-1) / sum ln(r_k / r_j) over its nearest cosine
    distances — the LOCAL manifold dimension, which can sit far
    below both the ambient 64 and C164's linear participation ratio
    when the data curls (PR is fooled by curvature, the MLE is
    not); the number that says what C104's matryoshka truncation
    can get away with.

    Scale shape: C8's eval-harness contract with a genuinely
    FIXED-COUNT query panel (mod-selected ids capped at 64, a no-op
    at every provided SF — the r5 16x audit caught the fixed-
    FRACTION form at O(n²/mod)); per-query top-k via one rank
    window, the MLE via a per-query reduction.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = emb.where(
        (F.col("vec_id") % QUERY_MOD == 0)
        & (F.col("vec_id") < QUERY_MOD * 64)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("eq"),
        F.col("nrm").alias("nq"),
    )
    cos = dot(F.col("eq"), F.col("e")) / (F.col("nq") * F.col("nrm"))
    scored = (
        emb.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        .select(
            F.col("qid").alias("query_id"),
            (1.0 - cos).alias("dist"),
            cos.alias("cos"),
            F.col("vec_id").alias("nid"),
        )
        .select(
            "query_id",
            "dist",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("nid")
                )
            )
            .alias("rank"),
        )
        .where(F.col("rank") <= ID_K)
    )
    topk = scored.withColumn(
        "rk",
        F.max(
            F.when(F.col("rank") == ID_K, F.col("dist"))
        ).over(Window.partitionBy("query_id")),
    )
    denom = F.sum(
        F.when(
            (F.col("rank") < ID_K) & (F.col("dist") > 0),
            F.log(F.col("rk") / F.col("dist")),
        ).otherwise(0.0)
    )
    per_q = (
        topk.groupBy("query_id")
        .agg(denom.alias("den"))
        .where(F.col("den") > 0)
        .select(((ID_K - 1.0) / F.col("den")).alias("id_mle"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        round_eps(F.avg("id_mle"), 4).alias("mean_intrinsic_dim"),
        round_eps(F.min("id_mle"), 4).alias("min_intrinsic_dim"),
        round_eps(F.max("id_mle"), 4).alias("max_intrinsic_dim"),
    )
