"""Ninety-fourth sweep (SURVEY.md §2 B174-B175, C169).

Cochran-Armitage trend test (is the fulfilled rate MONOTONE in the
ordered priority classes — the one-degree-of-freedom test that beats
the omnibus chi2 when the alternative is ordered), panel fixed-
effects elasticity (the within-estimator that nets out brand and
year effects B86/B171's cross-sections confound), and the lexical-
vs-semantic neighbour agreement (do shingle-Jaccard and embedding-
cosine retrieve the same top-5 — the overlap that says whether
hybrid fusion C54 has anything to add).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..functions.vectors import dot, norm, sql_cosine
from ..sources import load_table
from . import register
from .vector_plans import ANN_K, QUERY_MOD

# ---------------------------------------------------------------- B174

_B174_ORACLE = f"""
WITH grp AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders GROUP BY 1
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(k) AS BIGINT) AS kk,
         CAST(SUM(w * k) AS BIGINT) AS swk,
         CAST(SUM(w * n) AS BIGINT) AS swn,
         CAST(SUM(w * w * n) AS BIGINT) AS swwn
  FROM grp
),
stat AS (
  SELECT g, nn, kk,
         (swk - (kk * 1.0 / nn) * swn) AS t,
         (kk * 1.0 / nn) * (1.0 - kk * 1.0 / nn)
           * (swwn - (swn * 1.0) * swn / nn) AS v
  FROM red
)
SELECT g AS n_groups, nn AS n_orders,
       {sql_round('kk * 1.0 / nn', 6)} AS pooled_rate,
       {sql_round('t / sqrt(v)', 6)} AS z_trend,
       {sql_round('(t / sqrt(v)) * (t / sqrt(v))', 6)} AS chi2_trend
FROM stat
"""


@register("cochran_armitage_trend", oracle=_B174_ORACLE)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a monotone trend in the fulfilled
    share across the ORDERED priority classes (scores 1..5 read from
    the priority label): Z = sum w_i (k_i - n_i p) /
    sqrt(p q (sum n w^2 - (sum n w)^2 / N)) — one degree of freedom
    pointed at the ordered alternative, so it detects a drift the
    omnibus chi2 (B55) dilutes across 4 df. The dose-response test
    of categorical analytics.

    Exactness: every sufficient statistic (n, k, wk, wn, w^2 n) is
    an exact BIGINT from ONE aggregate; the Z algebra is O(1) with
    identical IEEE shapes.

    Scale shape: one map-side-combined aggregate to |groups| rows,
    one reduction — nothing else touches data volume.
    """
    grp = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.substring(F.col("o_orderpriority"), 1, 1)
            .cast("bigint")
            .alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("k"),
        )
    )
    red = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("k").cast("bigint").alias("kk"),
        F.sum(F.col("w") * F.col("k")).cast("bigint").alias("swk"),
        F.sum(F.col("w") * F.col("n")).cast("bigint").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n"))
        .cast("bigint")
        .alias("swwn"),
    )
    nn, kk = F.col("nn"), F.col("kk")
    p = kk * 1.0 / nn
    t = F.col("swk") - p * F.col("swn")
    v = p * (1.0 - p) * (F.col("swwn") - (F.col("swn") * 1.0) * F.col("swn") / nn)
    z = t / F.sqrt(v)
    return red.select(
        F.col("g").alias("n_groups"),
        nn.alias("n_orders"),
        round_eps(p, 6).alias("pooled_rate"),
        round_eps(z, 6).alias("z_trend"),
        round_eps(z * z, 6).alias("chi2_trend"),
    )


# ---------------------------------------------------------------- B175

_B175_ORACLE = f"""
WITH panel AS (
  SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
         ln(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
            * 1.0
            / SUM(CAST(ROUND(l.l_quantity) AS BIGINT))) AS x,
         ln(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) * 1.0) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
within AS (
  SELECT x - AVG(x) OVER (PARTITION BY brand)
           - AVG(x) OVER (PARTITION BY yr) + AVG(x) OVER () AS xt,
         y - AVG(y) OVER (PARTITION BY brand)
           - AVG(y) OVER (PARTITION BY yr) + AVG(y) OVER () AS yt,
         brand, yr
  FROM panel
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(COUNT(DISTINCT brand) AS BIGINT) AS n_brands,
       CAST(COUNT(DISTINCT yr) AS BIGINT) AS n_years,
       {sql_round('SUM(xt * yt) / SUM(xt * xt)', 6)} AS fe_elasticity,
       {sql_round(
           '(SUM(xt * yt) * SUM(xt * yt))'
           ' / (SUM(xt * xt) * SUM(yt * yt))', 6)} AS r2_within
FROM within
"""


@register("panel_fe_elasticity", oracle=_B175_ORACLE)
def panel_fe_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects (within) estimator of price elasticity
    on the brand x ship-year panel: log quantity on log unit price
    after sweeping out brand AND year means (x_it - xbar_i - xbar_t
    + xbar) — the panel regression that nets out both the
    brand-level confounds B86's pooled log-log absorbs into its
    slope and the macro year shocks B171's arcs ride. Reports the
    within R^2.

    Exactness: panel cells derive from exact BIGINT sums (one fact
    aggregate); demeaning is three window means over the bounded
    |brands| x |years| frame with identical IEEE shapes; the
    estimator is one ratio of frame-level sums.

    Scale shape: fact collapses once; everything after runs at
    panel-cell grain.
    """
    panel = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand", "yr")
        .agg(
            F.log(
                F.sum("cents").cast("bigint") * 1.0
                / F.sum("qty").cast("bigint")
            ).alias("x"),
            F.log(F.sum("qty").cast("bigint") * 1.0).alias("y"),
        )
    )
    w_b = Window.partitionBy("brand")
    w_y = Window.partitionBy("yr")
    w_all = Window.partitionBy()
    within = panel.select(
        "brand",
        "yr",
        (
            F.col("x")
            - F.avg("x").over(w_b)
            - F.avg("x").over(w_y)
            + F.avg("x").over(w_all)
        ).alias("xt"),
        (
            F.col("y")
            - F.avg("y").over(w_b)
            - F.avg("y").over(w_y)
            + F.avg("y").over(w_all)
        ).alias("yt"),
    )
    sxy = F.sum(F.col("xt") * F.col("yt"))
    sxx = F.sum(F.col("xt") * F.col("xt"))
    syy = F.sum(F.col("yt") * F.col("yt"))
    return within.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("brand").cast("bigint").alias("n_brands"),
        F.countDistinct("yr").cast("bigint").alias("n_years"),
        round_eps(sxy / sxx, 6).alias("fe_elasticity"),
        round_eps((sxy * sxy) / (sxx * syy), 6).alias("r2_within"),
    )


# ---------------------------------------------------------------- C169

LSA_SHINGLE_K = 3

_C169_ORACLE = f"""
WITH docs AS (
  SELECT d.doc_id AS id,
         {sql_shingles(sql_tokens('d.text'), LSA_SHINGLE_K)} AS sh,
         e.embedding AS emb
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT * FROM docs WHERE id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.id AS query_id, docs.id AS nid,
         len(list_intersect(q.sh, docs.sh)) * 1.0
           / len(list_distinct(q.sh || docs.sh)) AS jac,
         {sql_cosine('q.emb', 'docs.emb')} AS cos
  FROM q JOIN docs ON q.id <> docs.id
),
ranked AS (
  SELECT query_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY jac DESC, nid) AS r_lex,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, nid) AS r_sem
  FROM scored
)
SELECT query_id,
       CAST(SUM(CASE WHEN r_lex <= {ANN_K} AND r_sem <= {ANN_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_{ANN_K},
       {sql_round(
           f'SUM(CASE WHEN r_lex <= {ANN_K} AND r_sem <= {ANN_K}'
           f' THEN 1 ELSE 0 END) * 1.0 / {ANN_K}', 4)} AS agreement
FROM ranked GROUP BY query_id ORDER BY query_id
"""


@register("lexical_semantic_agreement", oracle=_C169_ORACLE)
def lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{ANN_K} neighbour agreement between lexical retrieval
    (exact shingle Jaccard) and semantic retrieval (embedding
    cosine) for the standard query subset (doc_id % {QUERY_MOD} = 0,
    riding the documents-embeddings id alignment): per query, how
    many of the two top-{ANN_K} lists coincide. High agreement means
    the dense index is re-deriving surface overlap; low agreement is
    exactly where hybrid fusion (C54's RRF) earns its keep and where
    C121-style threshold transfer between the two spaces breaks.

    Scale shape: the query side is a filtered broadcast against the
    corpus — the same declared exact eval-harness contract as C8 and
    C116 (all-pairs for a FIXED small query set; C53's streaming
    kernel is the production swap); both rankings come from two
    windows over the same scored frame, and the overlap is counted
    on that frame with no self-join.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        shingles(tokens(F.col("text")), LSA_SHINGLE_K).alias("sh"),
    ).join(
        load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("e"),
            norm(F.col("embedding")).alias("nrm"),
        ),
        "id",
    )
    # |A ∪ B| = |distinct A| + |distinct B| − |A ∩ B|: the per-doc
    # distinct size is computed ONCE on the persisted corpus frame, so
    # each of the |corpus|×|queries| pairs builds one hash set
    # (array_intersect) instead of two (intersect + union) — same
    # exact integers, half the per-pair set work. `inter` gets its own
    # projection so the division does not inline the intersect twice.
    docs = docs.select(
        "id", "sh", F.size(F.array_distinct("sh")).alias("nd"), "e", "nrm"
    )
    docs = docs.persist()
    q = docs.where(F.col("id") % QUERY_MOD == 0).select(
        F.col("id").alias("qid"),
        F.col("sh").alias("sh_q"),
        F.col("nd").alias("nd_q"),
        F.col("e").alias("e_q"),
        F.col("nrm").alias("nrm_q"),
    )
    pairs = (
        docs.join(F.broadcast(q), F.col("qid") != F.col("id"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("nid"),
            F.size(F.array_intersect("sh_q", "sh")).alias("inter"),
            "nd_q",
            "nd",
            (dot(F.col("e_q"), F.col("e")) / (F.col("nrm_q") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    scored = pairs.select(
        "query_id",
        "nid",
        (
            F.col("inter")
            * F.lit(1.0)
            / (F.col("nd_q") + F.col("nd") - F.col("inter"))
        ).alias("jac"),
        "cos",
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("jac").desc(), F.col("nid")
    )
    w_sem = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("nid")
    )
    ranked = scored.select(
        "query_id",
        F.row_number().over(w_lex).alias("r_lex"),
        F.row_number().over(w_sem).alias("r_sem"),
    )
    both = F.when(
        (F.col("r_lex") <= ANN_K) & (F.col("r_sem") <= ANN_K), 1
    ).otherwise(0)
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(both).cast("bigint").alias(f"overlap_at_{ANN_K}"),
            round_eps(F.sum(both) * 1.0 / ANN_K, 4).alias("agreement"),
        )
        .orderBy("query_id")
    )
