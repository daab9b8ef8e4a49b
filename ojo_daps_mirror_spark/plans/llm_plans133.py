"""Hundred-thirty-third sweep (SURVEY.md §2 B246, C217-C218).

Cramér-von Mises two-sample test (KS reacts to the single worst CDF
gap; CvM integrates ALL of it — the pairing that catches distributed
small departures KS misses), one-bit (sign) embedding retrieval
agreement (the most extreme quantization: 64 dims → 64 bits; overlap
with exact cosine top-k beside int8 and PQ says how much geometry the
signs alone carry), and a near-duplicate transitivity audit (the
connected-components dedup step ASSUMES near-dup edges close into
triangles; this measures the wedge closure rate that justifies — or
indicts — treating components as duplicate clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.vectors import cosine, sql_cosine
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B246

CVM_A = "1-URGENT"
CVM_B = "5-LOW"

_B246_ORACLE = f"""
WITH samp AS (
  SELECT o_orderkey AS okey,
         CASE WHEN o_orderpriority = '{CVM_A}' THEN 0 ELSE 1 END AS src,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
  WHERE o_orderpriority IN ('{CVM_A}', '{CVM_B}')
),
ranked AS (
  SELECT src,
         CAST(ROW_NUMBER() OVER (ORDER BY x, src, okey) AS BIGINT) AS r,
         CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY x, okey)
              AS BIGINT) AS i
  FROM samp
),
sums AS (
  SELECT CAST(SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN src = 0
                       THEN CAST(r - i AS HUGEINT) * (r - i) END)
              AS DOUBLE) AS ua,
         CAST(SUM(CASE WHEN src = 1
                       THEN CAST(r - i AS HUGEINT) * (r - i) END)
              AS DOUBLE) AS ub
  FROM ranked
),
stat AS (
  SELECT n, m,
         (n * ua + m * ub)
           / (CAST(n AS DOUBLE) * m * (n + m))
           - (4.0 * n * m - 1) / (6.0 * (n + m)) AS t
  FROM sums
)
SELECT n AS n_urgent, m AS n_low,
       {sql_round('t', 6)} AS cvm_t,
       0.461 AS crit_5pct,
       CASE WHEN t > 0.461 THEN 1 ELSE 0 END AS reject_same_dist_5pct
FROM stat
"""


@register("cramer_von_mises", oracle=_B246_ORACLE)
def cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample test that 1-URGENT and 5-LOW
    order values share a distribution — the integrated-gap partner
    of the B-track's KS: KS is the single WORST CDF gap (one bad
    quantile decides), CvM integrates the squared gap over the whole
    range, so many small distributed departures that KS shrugs at
    accumulate. Anderson's rank form: T = [n*sum(r_i - i)^2 +
    m*sum(s_j - j)^2] / (nm(n+m)) - (4nm-1)/(6(n+m)), against the
    asymptotic 5% point 0.461.

    Exactness: pooled and within-sample ranks come from the same
    total order (value, sample, orderkey) in both engines; the rank
    displacement squares are exact 128-bit integers.

    Scale shape: one filtered fact scan, two rank windows over the
    same sort, one reduction.
    """
    samp = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin(CVM_A, CVM_B))
        .select(
            F.col("o_orderkey").alias("okey"),
            F.when(F.col("o_orderpriority") == CVM_A, 0)
            .otherwise(1)
            .alias("src"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("x"),
        )
    )
    ranked = samp.select(
        "src",
        F.row_number()
        .over(Window.orderBy("x", "src", "okey"))
        .cast("bigint")
        .alias("r"),
        F.row_number()
        .over(Window.partitionBy("src").orderBy("x", "okey"))
        .cast("bigint")
        .alias("i"),
    )
    dec = "decimal(38,0)"
    disp = (F.col("r") - F.col("i")).cast(dec) * (F.col("r") - F.col("i"))
    sums = ranked.agg(
        F.sum((F.col("src") == 0).cast("int")).cast("bigint").alias("n"),
        F.sum((F.col("src") == 1).cast("int")).cast("bigint").alias("m"),
        F.sum(F.when(F.col("src") == 0, disp)).cast("double").alias("ua"),
        F.sum(F.when(F.col("src") == 1, disp)).cast("double").alias("ub"),
    )
    nd = F.col("n").cast("double")
    t = (F.col("n") * F.col("ua") + F.col("m") * F.col("ub")) / (
        nd * F.col("m") * (F.col("n") + F.col("m"))
    ) - (4.0 * F.col("n") * F.col("m") - 1) / (
        6.0 * (F.col("n") + F.col("m"))
    )
    return sums.select(
        F.col("n").alias("n_urgent"),
        F.col("m").alias("n_low"),
        round_eps(t, 6).alias("cvm_t"),
        F.lit(0.461).alias("crit_5pct"),
        (t > 0.461).cast("int").alias("reject_same_dist_5pct"),
    )


# ---------------------------------------------------------------- C217

OB_K = 10
# Fixed query panel: the recall audit queries only vec_id < OB_PANEL
# against ALL targets — O(panel x n), linear in corpus size, C8's
# eval-harness contract. At sf0.001/sf0.01 (500 vectors) the panel IS
# the whole corpus, so semantics there are unchanged; replica builds
# offset vec_ids by 10M, so the panel stays a fixed 500 queries at any
# replica scale (the r5 16x audit caught the old every-query all-pairs
# form thrashing a 2.5e10-row persist).
OB_PANEL = 500

_C217_ORACLE = f"""
WITH bits AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, v -> CASE WHEN v > 0 THEN 1 ELSE 0 END)
           AS sgn,
         embedding
  FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS q, b.vec_id AS t,
         {sql_cosine('a.embedding', 'b.embedding')} AS cos,
         len(list_filter(range(1, len(a.sgn) + 1),
                         i -> a.sgn[i] = b.sgn[i])) AS ham_match
  FROM bits a JOIN bits b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {OB_PANEL}
),
cos_top AS (
  SELECT q, t FROM (
    SELECT q, t, ROW_NUMBER() OVER (PARTITION BY q
                                    ORDER BY cos DESC, t) AS rk
    FROM pairs) WHERE rk <= {OB_K}
),
bit_top AS (
  SELECT q, t FROM (
    SELECT q, t, ROW_NUMBER() OVER (PARTITION BY q
                                    ORDER BY ham_match DESC, t) AS rk
    FROM pairs) WHERE rk <= {OB_K}
),
ovl AS (
  SELECT c.q, CAST(COUNT(b.t) AS BIGINT) AS hits
  FROM cos_top c LEFT JOIN bit_top b ON c.q = b.q AND c.t = b.t
  GROUP BY c.q
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST({OB_K} AS BIGINT) AS k,
       {sql_round(f'SUM(hits) / (COUNT(*) * {OB_K}.0)', 6)}
         AS mean_recall_at_k,
       CAST(MIN(hits) AS BIGINT) AS worst_query_hits,
       CAST(SUM(CASE WHEN hits = {OB_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS perfect_queries
FROM ovl
"""


@register("onebit_retrieval_agreement", oracle=_C217_ORACLE)
def onebit_retrieval_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-bit embedding retrieval: binarize every dimension to its
    SIGN (64 dims → 64 bits, a 32x compression beyond int8) and
    measure how much of the exact cosine top-{OB_K} the sign-match
    (Hamming) ranking recovers. Completes the quantization ladder —
    embedding_quantize_int8 and ann_pq_adc price 4x and ~16x
    compressions; this is the floor: if mean recall stays high, the
    testdata's geometry lives in the orthant pattern and a binary
    index (SimHash-style, one popcount per comparison) carries the
    recall; if it collapses, magnitudes matter and 1-bit is a
    filter, not an index.

    Exactness: sign bits and Hamming matches are exact integers;
    ties in the integer Hamming ranking break by vec_id in both
    engines; cosine ranking is the shared identical double tree.

    Scale shape: a FIXED query panel (vec_id < OB_PANEL) against
    all targets — O(panel x n) like every other eval harness here
    (C8's contract; retrieval_mrr / ndcg_eval share the shape). The
    1-bit path at scale is hamming-band bucketing like dedup_simhash —
    the audit, not the scan, is the product.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id",
        "embedding",
        F.expr(
            "transform(embedding, v -> CASE WHEN v > 0 THEN 1 ELSE 0 END)"
        ).alias("sgn"),
    )
    a = bits.where(F.col("vec_id") < OB_PANEL).alias("a")
    b = bits.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("q"),
        F.col("b.vec_id").alias("t"),
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        F.expr(
            "size(filter(sequence(1, size(a.sgn)),"
            " i -> a.sgn[i - 1] = b.sgn[i - 1]))"
        ).alias("ham_match"),
    )
    pairs = pairs.persist()
    cos_top = (
        pairs.select(
            "q",
            "t",
            F.row_number()
            .over(Window.partitionBy("q").orderBy(F.col("cos").desc(), "t"))
            .alias("rk"),
        )
        .where(F.col("rk") <= OB_K)
        .select("q", "t")
    )
    bit_top = (
        pairs.select(
            "q",
            "t",
            F.row_number()
            .over(
                Window.partitionBy("q").orderBy(
                    F.col("ham_match").desc(), "t"
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") <= OB_K)
        .select("q", F.col("t").alias("bt"))
    )
    ovl = (
        cos_top.join(
            bit_top,
            (cos_top.q == bit_top.q) & (cos_top.t == bit_top.bt),
            "left",
        )
        .groupBy(cos_top.q)
        .agg(F.count(F.col("bt")).cast("bigint").alias("hits"))
    )
    return ovl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(OB_K).cast("bigint").alias("k"),
        round_eps(
            F.sum("hits") / (F.count(F.lit(1)) * float(OB_K)), 6
        ).alias("mean_recall_at_k"),
        F.min("hits").cast("bigint").alias("worst_query_hits"),
        F.sum((F.col("hits") == OB_K).cast("int"))
        .cast("bigint")
        .alias("perfect_queries"),
    )


# ---------------------------------------------------------------- C218

ND_COS = 0.4  # near-dup edge threshold (matches vector_plans)

_C218_ORACLE = f"""
WITH edges AS MATERIALIZED (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {sql_cosine('a.embedding', 'b.embedding')} >= {ND_COS}
),
und AS MATERIALIZED (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
),
wedges AS (
  SELECT a.v AS center, a.u AS x, b.v AS y
  FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
),
closed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS closed_w
  FROM wedges w JOIN edges e ON w.x = e.u AND w.y = e.v
),
cnts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
         (SELECT closed_w FROM closed) AS n_closed
)
SELECT n_edges, n_wedges, n_closed,
       CAST(n_closed // 3 AS BIGINT) AS triangles,
       {sql_round('CAST(n_closed AS DOUBLE) / NULLIF(n_wedges, 0)', 6)}
         AS closure_rate
FROM cnts
"""


@register("neardup_transitivity_audit", oracle=_C218_ORACLE)
def neardup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the cosine near-duplicate graph
    (threshold {ND_COS}, the vector_plans edge rule): the
    connected-components dedup step (A11/C10) treats components as
    duplicate CLUSTERS, which is only honest if near-dup edges
    actually close — this measures the wedge closure rate (fraction
    of A~B~C paths where A~C holds). High closure says components
    are tight clusters and keep-one-per-component is safe; low
    closure says components are CHAINS (A~B~C with A,C unrelated)
    and the dedup is deleting non-duplicates — the classic
    transitive-closure failure of threshold dedup, now measured
    instead of assumed.

    Exactness: the edge set is exact (shared cosine tree vs a
    literal threshold, far from rounding boundaries); wedge and
    closure counts are exact integers.

    Scale shape: edges are A13's block-pair BLAS kernel (same 0.4
    threshold — near_dup_cosine's exact all-pairs, each unordered
    pair computed in exactly one task); the wedge join is edge-grain
    (near-dup graphs are sparse by construction — that is what the
    threshold is FOR), one join to close. The r5 16x audit replaced
    the original expression-tree BNLJ edge build here: a cosine
    filter inside BroadcastNestedLoopJoin evaluates OUTSIDE
    whole-stage codegen, and 5e8 interpreted 64-dim aggregates took
    ~30 min where the blocked matmul takes seconds.
    """
    from .vector_plans import near_dup_cosine

    edges = near_dup_cosine(spark, sf_dir).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    edges = edges.persist()
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    wa = und.alias("wa")
    wb = und.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.v") == F.col("wb.u")) & (F.col("wa.u") < F.col("wb.v")),
    ).select(
        F.col("wa.u").alias("x"),
        F.col("wb.v").alias("y"),
    )
    wedges = wedges.persist()
    closed = wedges.join(
        edges, (wedges.x == edges.u) & (wedges.y == edges.v)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_closed"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_wedges = wedges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges")
    )
    out = (
        n_edges.transform(scalars(n_wedges))
        .transform(scalars(closed))
    )
    return out.select(
        "n_edges",
        "n_wedges",
        "n_closed",
        F.expr("n_closed div 3").cast("bigint").alias("triangles"),
        round_eps(
            F.col("n_closed").cast("double")
            / F.nullif(F.col("n_wedges"), F.lit(0)),
            6,
        ).alias("closure_rate"),
    )
