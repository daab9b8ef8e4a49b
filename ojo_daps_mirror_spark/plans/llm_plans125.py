"""Hundred-twenty-fifth sweep (SURVEY.md §2 C202-C204).

Bloom-filter false-positive audit with EXPLICIT bit positions (the
decontamination blocklist as visible rows — measured FPR against the
exact anti-join truth, next to the theoretical curve), weighted
reservoir sampling by Efraimidis-Spirakis exponential keys (the
one-pass mergeable 'sample k docs proportional to length' primitive
every mixture builder needs), and linear CKA between the two HALVES
of the embedding vector (how redundant are the dimensions — the
representation-similarity number, computed purely from d x d
cross-moment sums so the n x n Gram matrix never exists).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C202

BLOOM_M = 16384  # bits
BLOOM_K = 4  # hash functions
_BLOOM_SRC = "src0"  # blocklist source
# ln(1 - 1/m) folded in Python so neither engine's DECIMAL-literal
# division or libm ln enters the constant.
_LN1M = math.log(1.0 - 1.0 / BLOOM_M)


def _tg_cte() -> str:
    return """
toks AS MATERIALIZED (
  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS ts
  FROM documents
),
tg AS MATERIALIZED (
  SELECT DISTINCT source, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
)"""


_C202_ORACLE = f"""
WITH {_tg_cte()},
members AS MATERIALIZED (
  SELECT DISTINCT g FROM tg WHERE source = '{_BLOOM_SRC}'
),
probes AS (
  SELECT DISTINCT g FROM tg
  WHERE g NOT IN (SELECT g FROM members)
),
bits AS MATERIALIZED (
  SELECT DISTINCT
         {sql_hash64("'b' || j || '|' || g")} % {BLOOM_M} AS pos
  FROM members, UNNEST(range(1, {BLOOM_K} + 1)) AS r(j)
),
probe_hits AS (
  SELECT p.g,
         CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hits
  FROM (SELECT g, {sql_hash64("'b' || j || '|' || g")} % {BLOOM_M} AS pos
        FROM probes, UNNEST(range(1, {BLOOM_K} + 1)) AS r(j)) p
  LEFT JOIN bits b USING (pos)
  GROUP BY p.g
),
agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_member,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
         CAST(COUNT(*) AS BIGINT) AS n_probe,
         CAST(SUM(CASE WHEN hits = {BLOOM_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS false_pos
  FROM probe_hits
)
SELECT n_member, n_probe, bits_set, false_pos,
       {sql_round('CAST(false_pos AS DOUBLE) / n_probe', 6)}
         AS empirical_fpr,
       {sql_round(
           f'exp({BLOOM_K} * ln(1.0 - exp({BLOOM_K} * n_member'
           f' * {_LN1M!r})))', 6)} AS theoretical_fpr,
       {sql_round(f'CAST(bits_set AS DOUBLE) / {BLOOM_M}', 6)}
         AS fill_ratio
FROM agg
"""


@register("bloom_fpr_audit", oracle=_C202_ORACLE)
def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination blocklist with the bit array as
    VISIBLE rows: build an m={BLOOM_M}, k={BLOOM_K} filter over one
    source's distinct token-trigrams, probe every trigram that is
    truly absent (exact anti-join supplies ground truth), and report
    the measured false-positive rate next to the textbook
    (1-e^(-kn/m))^k curve and the bit fill ratio. This is the audit
    bloom_decontaminate (C-track) cannot do with Spark's opaque
    native filter — here both engines construct the IDENTICAL bit
    set from the shared md5 hash64, so even the false positives are
    the same rows, hash-matched. The operational question it answers
    at 100 TB: is the blocklist filter sized right, or is it silently
    discarding fill_ratio-worth of clean training data?

    Exactness: bit positions and hit counts are exact integers; the
    two rates divide exact integers; the theoretical curve is the
    identical exp/ln tree in both engines.

    Scale shape: members and probes collapse to distinct grain
    map-side; the bit set is at most m rows (broadcastable at any
    corpus size — that is the point of a Bloom filter); one k-way
    explode + broadcast join + group on the probe side.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.lower(F.col("text")), r"\s+").alias("ts"),
    )
    tg = docs.select(
        "source",
        F.explode(
            F.expr(
                "transform(slice(ts, 1, size(ts) - 2),"
                " (x, i) -> concat(x, ' ', ts[i + 1], ' ', ts[i + 2]))"
            )
        ).alias("g"),
    ).distinct()
    tg = tg.persist()
    members = (
        tg.where(F.col("source") == _BLOOM_SRC).select("g").distinct()
    )
    probes = tg.select("g").distinct().join(members, "g", "left_anti")
    js = F.explode(
        F.array(*[F.lit(j) for j in range(1, BLOOM_K + 1)])
    ).alias("j")
    pos = hash64(
        F.concat(F.lit("b"), F.col("j").cast("string"), F.lit("|"),
                 F.col("g"))
    ) % BLOOM_M
    bits = (
        members.select("g", js)
        .select(pos.alias("pos"))
        .distinct()
    )
    probe_hits = (
        probes.select("g", js)
        .select("g", pos.alias("pos"))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("g")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
             .cast("bigint").alias("hits"))
    )
    n_member = members.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_member")
    )
    bits_set = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    agg = probe_hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum((F.col("hits") == BLOOM_K).cast("int"))
        .cast("bigint")
        .alias("false_pos"),
    )
    out = attach_scalars(attach_scalars(agg, n_member), bits_set)
    theo = F.exp(
        BLOOM_K
        * F.log(
            1.0 - F.exp(BLOOM_K * F.col("n_member") * F.lit(_LN1M))
        )
    )
    return out.select(
        "n_member",
        "n_probe",
        "bits_set",
        "false_pos",
        round_eps(
            F.col("false_pos").cast("double") / F.col("n_probe"), 6
        ).alias("empirical_fpr"),
        round_eps(theo, 6).alias("theoretical_fpr"),
        round_eps(F.col("bits_set").cast("double") / BLOOM_M, 6).alias(
            "fill_ratio"
        ),
    )


# ---------------------------------------------------------------- C203

WRS_K = 20
_HASH_SCALE = float(1 << 60)  # hash64 is 15 hex chars = 60 bits

_C203_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ln(({sql_hash64("'wrs|' || doc_id")} + 1.0) / {_HASH_SCALE!r})
           / n_chars AS k
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, weight, k,
         CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS BIGINT)
           AS rank,
         CAST(SUM(weight) OVER () AS BIGINT) AS total_w,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM keyed
)
SELECT rank, doc_id, weight,
       {sql_round('k', 6)} AS es_key,
       {sql_round(f'CAST(weight AS DOUBLE) * {WRS_K} / total_w', 6)}
         AS naive_inclusion_approx,
       n AS corpus_docs
FROM ranked
WHERE rank <= {WRS_K}
ORDER BY rank
"""


@register("weighted_reservoir_sample", oracle=_C203_ORACLE)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement:
    each doc draws the key u^(1/w) (equivalently ln(u)/w, monotone)
    from a deterministic hash-uniform u and weight w = n_chars; the
    top-{WRS_K} keys ARE a length-proportional sample without
    replacement. This is THE one-pass distributed weighted sampler:
    keys are independent per row (map-side), top-k is a mergeable
    aggregate (per-partition top-k then merge — no global sort at
    scale), and restarts/retries reproduce the identical sample
    because u is a hash, not an RNG. stratified_sample (C19) and
    group_sample_fixed draw uniform per stratum; this one weights —
    the 'sample tokens, not documents' correction every mixture
    builder needs.

    Exactness: u is an exact 60-bit integer over 2^60; ln and divide
    are identical double trees; selection gaps between adjacent keys
    are astronomically larger than 1-ulp double noise, and the
    (key, doc_id) tiebreak is total.

    Scale shape: map-side key + ONE top-k (local[32] runs it as a
    sort-limit; a cluster runs per-partition TakeOrdered + merge) —
    zero wide shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        (
            F.log(
                (
                    hash64(
                        F.concat(F.lit("wrs|"), F.col("doc_id").cast("string"))
                    )
                    + 1.0
                )
                / _HASH_SCALE
            )
            / F.col("n_chars")
        ).alias("k"),
    )
    totals = keyed.agg(
        F.sum("weight").cast("bigint").alias("total_w"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # Global top-K via orderBy+limit — Spark plans it as
    # TakeOrderedAndProject (per-partition top-K, bounded merge), so
    # no window ever sees the doc-grain frame; the rank is then a
    # row_number over the K-row survivor frame.
    topk = keyed.orderBy(F.col("k").desc(), F.col("doc_id")).limit(WRS_K)
    ranked = topk.select(
        "doc_id",
        "weight",
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("k").desc(), F.col("doc_id")))
        .cast("bigint")
        .alias("rank"),  # K-row frame: dimension-scale window
    )
    return (
        attach_scalars(ranked, totals)
        .select(
            "rank",
            "doc_id",
            "weight",
            round_eps(F.col("k"), 6).alias("es_key"),
            round_eps(
                F.col("weight").cast("double") * WRS_K / F.col("total_w"), 6
            ).alias("naive_inclusion_approx"),
            F.col("n").alias("corpus_docs"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------- C204

CKA_D = 64  # embedding dimension; halves are 0-31 vs 32-63


_C204_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, {CKA_D} + 1)) AS r(i)
),
mu AS MATERIALIZED (
  SELECT dim, SUM(v) / COUNT(*) AS m FROM e GROUP BY dim
),
c AS MATERIALIZED (
  SELECT e.vec_id, e.dim, e.v - mu.m AS v
  FROM e JOIN mu USING (dim)
),
g AS (
  SELECT a.dim AS i, b.dim AS j, SUM(a.v * b.v) AS gij
  FROM c a JOIN c b USING (vec_id)
  GROUP BY a.dim, b.dim
),
norms AS (
  SELECT SUM(CASE WHEN i < {CKA_D // 2} AND j >= {CKA_D // 2}
                  THEN gij * gij ELSE 0 END) AS cross2,
         SUM(CASE WHEN i < {CKA_D // 2} AND j < {CKA_D // 2}
                  THEN gij * gij ELSE 0 END) AS xx2,
         SUM(CASE WHEN i >= {CKA_D // 2} AND j >= {CKA_D // 2}
                  THEN gij * gij ELSE 0 END) AS yy2,
         (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) FROM e) AS n
  FROM g
)
SELECT n AS n_vectors, CAST({CKA_D} AS BIGINT) AS dim,
       {sql_round('cross2 / (sqrt(xx2) * sqrt(yy2))', 6)} AS linear_cka,
       {sql_round('sqrt(cross2)', 6)} AS cross_fnorm,
       {sql_round('sqrt(xx2)', 6)} AS x_gram_fnorm,
       {sql_round('sqrt(yy2)', 6)} AS y_gram_fnorm
FROM norms
"""


@register("linear_cka_redundancy", oracle=_C204_ORACLE)
def linear_cka_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment) between the FIRST and
    SECOND halves of the embedding vector — the
    representation-similarity number (Kornblith et al.'s linear
    case) pointed at dimension redundancy: CKA near 1 says the back
    32 dims re-encode the front 32 (truncate and save half the ANN
    index); near 0 says they carry independent structure
    (matryoshka_recall measures the same thing via retrieval, this
    via alignment — two views, one decision). Computed ENTIRELY from
    the d x d cross-moment matrix (||Xc'Yc||_F^2 /
    (||Xc'Xc||_F ||Yc'Yc||_F)) — the n x n Gram matrix of the
    textbook definition never materialises, which is what makes the
    statistic computable at corpus scale.

    Exactness: float32 inputs widen exactly to double; the only
    cross-engine wobble is double-sum order inside each of the 4096
    moment cells, absorbed by 6-dp rounding.

    Scale shape: explode to (vec, dim) grain, one d-row broadcast of
    means, one self-join on vec_id (d^2 expansion bounded by d=64,
    NOT by n), one d^2-cell aggregate that combines map-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    mu = e.groupBy("dim").agg((F.sum("v") / F.count(F.lit(1))).alias("m"))
    c = (
        e.join(F.broadcast(mu), "dim")
        .select("vec_id", "dim", (F.col("v") - F.col("m")).alias("v"))
    )
    a = c.alias("a")
    b = c.alias("b")
    g = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(
            F.col("a.dim").alias("i"), F.col("b.dim").alias("j")
        )
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("gij"))
    )
    half = CKA_D // 2
    n = emb.agg(F.countDistinct("vec_id").cast("bigint").alias("n"))
    norms = g.agg(
        F.sum(
            F.when(
                (F.col("i") < half) & (F.col("j") >= half),
                F.col("gij") * F.col("gij"),
            ).otherwise(0.0)
        ).alias("cross2"),
        F.sum(
            F.when(
                (F.col("i") < half) & (F.col("j") < half),
                F.col("gij") * F.col("gij"),
            ).otherwise(0.0)
        ).alias("xx2"),
        F.sum(
            F.when(
                (F.col("i") >= half) & (F.col("j") >= half),
                F.col("gij") * F.col("gij"),
            ).otherwise(0.0)
        ).alias("yy2"),
    )
    norms = attach_scalars(norms, n)
    return norms.select(
        F.col("n").alias("n_vectors"),
        F.lit(CKA_D).cast("bigint").alias("dim"),
        round_eps(
            F.col("cross2") / (F.sqrt(F.col("xx2")) * F.sqrt(F.col("yy2"))),
            6,
        ).alias("linear_cka"),
        round_eps(F.sqrt(F.col("cross2")), 6).alias("cross_fnorm"),
        round_eps(F.sqrt(F.col("xx2")), 6).alias("x_gram_fnorm"),
        round_eps(F.sqrt(F.col("yy2")), 6).alias("y_gram_fnorm"),
    )
