"""Fifty-second sweep (SURVEY.md §2 C114-C116).

Maximal-marginal-relevance diverse top-k (Carbonell-Goldstein 1998 —
the diversity-aware reranker, greedy loop folded INSIDE one array
expression like B98's chain solve), a word2vec-style negative-sampling
table (unigram^0.75), and an NDCG retrieval-quality harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..functions.vectors import cosine, sql_cosine
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C114

MMR_QUERY_ID = 0  # the query vector
MMR_POOL = 20  # relevance-ranked candidate pool
MMR_K = 5  # diverse picks
MMR_LAMBDA = 0.7  # relevance vs diversity trade-off


def _mmr_oracle() -> str:
    lam, om = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    # max similarity of candidate i to the already-selected set
    maxsim = (
        "CASE WHEN len(acc) = 0 THEN 0.0 ELSE list_max(list_transform(acc, "
        "a -> ROUND(list_dot_product(pool[i].en, pool[a.idx].en), 9))) END"
    )
    score = f"ROUND({lam!r} * pool[i].rel - {om!r} * ({maxsim}), 9)"
    sorted_pick = f"""list_sort(list_transform(
          list_filter(range(1, {MMR_POOL + 1}),
            i -> NOT list_contains(list_transform(acc, a -> a.idx), i)),
          i -> struct_pack(s := -({score}), vid := pool[i].vid, idx := i)
        ))[1]"""
    # the winning struct is inlined twice (no LET binding inside SQL
    # lambdas; the pool is tiny so double evaluation is free)
    step = (
        f"list_append(acc, struct_pack(idx := ({sorted_pick}).idx, "
        f"sc := -(({sorted_pick}).s)))"
    )
    empties = ", ".join("[]" for _ in range(MMR_K + 1))
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
q AS (SELECT e FROM v WHERE vec_id = {MMR_QUERY_ID}),
rels AS (
  SELECT v.vec_id AS vid,
         ROUND({sql_cosine('v.e', 'q.e')}, 9) AS rel,
         list_transform(v.e, x -> x / sqrt(list_dot_product(v.e, v.e)))
           AS en
  FROM v CROSS JOIN q WHERE v.vec_id <> {MMR_QUERY_ID}
),
pooled AS (
  SELECT list(struct_pack(vid := vid, rel := rel, en := en)
              ORDER BY rel DESC, vid) AS pool
  FROM (SELECT * FROM rels ORDER BY rel DESC, vid LIMIT {MMR_POOL})
),
folded AS (
  SELECT list_reduce(
           [{empties}]::STRUCT(idx BIGINT, sc DOUBLE)[][],
           (acc, p) -> {step}) AS sel, pool
  FROM pooled
)
,
expanded AS (
  SELECT pool, sel,
         unnest(generate_series(1, len(sel))) AS rank
  FROM folded
)
SELECT rank,
       pool[sel[rank].idx].vid AS vec_id,
       {sql_round('pool[sel[rank].idx].rel', 6)} AS rel,
       {sql_round('sel[rank].sc', 6)} AS mmr_score
FROM expanded
ORDER BY rank
"""


@register("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance (Carbonell-Goldstein): greedily pick
    {MMR_K} of the top-{MMR_POOL} most-relevant vectors, each step
    maximising λ·rel − (1−λ)·max-sim-to-selected — the diversity-aware
    reranker that stops retrieval returning {MMR_K} near-duplicates
    (C74 reranks by score alone; this trades score against redundancy).

    Scale shape: relevance is one broadcast-query map pass; the pool
    cut is TakeOrdered top-{MMR_POOL}; the greedy loop — inherently
    sequential — runs INSIDE one array-fold expression over the
    collapsed pool row (B98's recipe: no driver loop, no per-step
    job). Every similarity and score quantises to 9 dp, so both
    engines make identical picks; ties break by vector id.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.where(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("e").alias("qe")
    )
    rels = (
        emb.where(F.col("vec_id") != MMR_QUERY_ID)
        .transform(scalars(q))
        .select(
            F.col("vec_id").alias("vid"),
            F.round(cosine(F.col("e"), F.col("qe")), 9).alias("rel"),
            "e",
        )
    )
    pool_rows = rels.orderBy(F.desc("rel"), "vid").limit(MMR_POOL)
    # Normalise AFTER the TakeOrdered pool cut: the norm divide inlines
    # the sum-of-squares aggregate into every element's lambda (an
    # O(dim^2) expression per row), and only the {MMR_POOL} pooled
    # vectors' normalised forms are ever read — paying it corpus-wide
    # was pure waste at every scale.
    def _normed(e):
        nrm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
        return F.transform(e, lambda x: x / nrm)

    pooled = pool_rows.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("rel")).alias("o"), "vid", "rel", "e"))
        ).alias("ps")
    ).select(
        F.transform(
            "ps",
            lambda s: F.struct(
                s["vid"].alias("vid"),
                s["rel"].alias("rel"),
                _normed(s["e"]).alias("en"),
            ),
        ).alias("pool")
    )
    lam, om = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    pool = F.col("pool")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    def step(acc, _):
        sel_idx = F.transform(acc, lambda a: a["idx"])

        def score(i):
            maxsim = F.when(F.size(acc) == 0, F.lit(0.0)).otherwise(
                F.array_max(
                    F.transform(
                        acc,
                        lambda a: F.round(
                            dot(
                                F.element_at(pool, i.cast("int"))["en"],
                                F.element_at(pool, a["idx"].cast("int"))["en"],
                            ),
                            9,
                        ),
                    )
                )
            )
            return F.round(
                lam * F.element_at(pool, i.cast("int"))["rel"] - om * maxsim, 9
            )

        cands = F.filter(
            F.sequence(F.lit(1).cast("bigint"), F.lit(MMR_POOL).cast("bigint")),
            lambda i: ~F.array_contains(sel_idx, i),
        )
        scored = F.transform(
            cands,
            lambda i: F.struct(
                (-score(i)).alias("s"),
                F.element_at(pool, i.cast("int"))["vid"].alias("vid"),
                i.alias("idx"),
            ),
        )
        best = F.array_min(scored)
        return F.concat(
            acc,
            F.array(
                F.struct(best["idx"].alias("idx"), (-best["s"]).alias("sc"))
            ),
        )

    empty = F.expr("CAST(array() AS array<struct<idx:bigint,sc:double>>)")
    folded = F.aggregate(F.sequence(F.lit(1), F.lit(MMR_K)), empty, step)
    sel = pooled.select(pool.alias("pool"), folded.alias("sel"))
    out = sel.select(
        F.posexplode("sel").alias("pos", "s"), F.col("pool")
    ).select(
        (F.col("pos") + 1).alias("rank"),
        F.element_at(F.col("pool"), F.col("s")["idx"].cast("int"))["vid"].alias(
            "vec_id"
        ),
        round_eps(
            F.element_at(F.col("pool"), F.col("s")["idx"].cast("int"))["rel"], 6
        ).alias("rel"),
        round_eps(F.col("s")["sc"], 6).alias("mmr_score"),
    )
    return out.orderBy("rank")


# ---------------------------------------------------------------- C115

NS_POWER = 0.75  # unigram smoothing exponent (word2vec's 3/4)

_C115_ORACLE = f"""
WITH tok AS (
  SELECT unnest({sql_tokens('text')}) AS t FROM documents
),
vocab AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE t <> '' GROUP BY t
),
weighted AS (
  SELECT t, c,
         CAST(ROUND(POWER(c, {NS_POWER}) * 1e6) AS BIGINT) AS w6
  FROM vocab
),
tot AS (SELECT SUM(w6) AS tw FROM weighted)
SELECT t AS token, c AS cnt,
       {sql_round('w6 * 1.0 / tot.tw', 6)} AS p,
       {sql_round(
           'SUM(w6) OVER (ORDER BY c DESC, t '
           'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) '
           '* 1.0 / tot.tw', 6)} AS cum_p
FROM weighted CROSS JOIN tot
ORDER BY cnt DESC, token
"""


@register("negative_sampling_table", oracle=_C115_ORACLE)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling distribution: unigram counts raised
    to the 3/4 power, normalised, with the cumulative distribution a
    sampler binary-searches — the classic embedding-training prep
    table (Mikolov et al. 2013), deterministic and reshard-stable.

    Scale shape: one token-grain aggregate (map-side combined) to the
    vocabulary table; weights quantise to integer micro-units so the
    normaliser and the ordered cumulative sums are exact integer math
    (the ordered window runs at vocabulary grain — range-partitioned
    two-pass cumsum is the billion-type swap, B91's note).
    """
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    weighted = vocab.select(
        "t",
        "c",
        F.round(F.pow("c", NS_POWER) * 1e6).cast("bigint").alias("w6"),
    )
    tot = weighted.agg(F.sum("w6").alias("tw"))
    w_cum = Window.orderBy(F.desc("c"), "t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        weighted.transform(scalars(tot))
        .select(
            F.col("t").alias("token"),
            F.col("c").alias("cnt"),
            round_eps(F.col("w6") * 1.0 / F.col("tw"), 6).alias("p"),
            round_eps(
                F.sum("w6").over(w_cum) * 1.0 / F.col("tw"), 6
            ).alias("cum_p"),
        )
        .orderBy(F.desc("cnt"), "token")
    )


# ---------------------------------------------------------------- C116

NDCG_MOD = 10  # vec_id % MOD == 0 → query subset
NDCG_K = 10


def _ndcg_oracle() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id % {NDCG_MOD} = 0),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel, v.vec_id AS nid,
         CASE WHEN v.label = q.label THEN 1 ELSE 0 END AS gain,
         {sql_cosine('q.e', 'v.e')} AS cos
  FROM q JOIN v ON q.vec_id <> v.vec_id
),
ranked AS (
  SELECT query_id, qlabel, gain,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, nid) AS r
  FROM scored
),
dcg AS (
  SELECT query_id, qlabel,
         CAST(SUM(CASE WHEN r <= {NDCG_K}
                       THEN ROUND(gain / log2(r + 1.0) * 1e9) ELSE 0 END)
              AS BIGINT) AS dcg9,
         CAST(SUM(gain) AS BIGINT) AS n_rel
  FROM ranked GROUP BY 1, 2
),
ideal AS (
  SELECT query_id, qlabel, dcg9,
         CAST((SELECT SUM(ROUND(1.0 / log2(i + 1.0) * 1e9))
               FROM unnest(generate_series(1, LEAST(n_rel, {NDCG_K}))) AS s(i))
              AS BIGINT) AS idcg9
  FROM dcg
),
per_q AS (
  SELECT qlabel,
         CAST(ROUND(dcg9 * 1.0 / idcg9 * 1e6) AS BIGINT) AS ndcg6
  FROM ideal WHERE idcg9 > 0
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       {sql_round('SUM(ndcg6) / 1e6 / COUNT(*)', 6)} AS mean_ndcg
FROM per_q GROUP BY qlabel ORDER BY label
"""


@register("ndcg_eval", oracle=_ndcg_oracle())
def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} retrieval-quality harness: binary gain (neighbour
    shares the query's label), DCG over the cosine ranking, ideal DCG
    from the query's relevant-count — mean per label. The ranking
    quality gate next to C68 (accuracy) and C104 (recall): NDCG cares
    WHERE the relevant items rank, not just whether they appear.

    Scale shape: the all-pairs scoring here is the declared eval
    harness form (C8's contract); C53's streaming-BLAS kernel is the
    production swap. Per-position gains quantise to integer nano-units
    before summing and per-query NDCG to micro-units before the label
    mean, so both engines reduce exact integers.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("label").alias("qlabel"),
    ).where(F.col("query_id") % NDCG_MOD == 0)
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "qlabel",
        F.col("vec_id").alias("nid"),
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("gain"),
        cosine(F.col("qe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "nid")
    ranked = scored.withColumn("r", F.row_number().over(w))
    dcg = ranked.groupBy("query_id", "qlabel").agg(
        F.sum(
            F.when(
                F.col("r") <= NDCG_K,
                F.round(F.col("gain") / F.log2(F.col("r") + 1.0) * 1e9),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("dcg9"),
        F.sum("gain").cast("bigint").alias("n_rel"),
    )
    idcg = F.aggregate(
        F.sequence(
            F.lit(1).cast("bigint"),
            F.least(F.col("n_rel"), F.lit(NDCG_K).cast("bigint")),
        ),
        F.lit(0.0),
        lambda a, i: a + F.round(1.0 / F.log2(i + 1.0) * 1e9),
    ).cast("bigint")
    per_q = dcg.select(
        "qlabel", "dcg9", idcg.alias("idcg9")
    ).where(F.col("idcg9") > 0).select(
        "qlabel",
        F.round(F.col("dcg9") * 1.0 / F.col("idcg9") * 1e6)
        .cast("bigint")
        .alias("ndcg6"),
    )
    return (
        per_q.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            round_eps(F.sum("ndcg6") / 1e6 / F.count(F.lit(1)), 6).alias(
                "mean_ndcg"
            ),
        )
        .orderBy("label")
    )
