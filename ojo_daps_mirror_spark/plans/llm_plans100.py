"""Hundredth sweep (SURVEY.md §2 B186, C175-C176).

Process capability indices (Cp/Cpk of lead time against spec limits
— the "can this process meet the SLA at all" number B160's control
chart assumes), D'Hondt proportional shard apportionment (the
integer seat-allocation algorithm pointed at "give each source a
whole number of shards proportional to token mass" — B111's
rendezvous routes keys, this sizes the fleet), and retrieval MRR
(mean reciprocal rank of the first same-label neighbour — the
metric that grades the TOP of the ranking where NDCG@10 (C116)
spreads credit across it).
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

# ---------------------------------------------------------------- B186

CPK_LSL = 0
CPK_USL = 90

_B186_ORACLE = f"""
WITH lt AS (
  SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s1,
         CAST(SUM(CAST(d AS BIGINT) * d) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN d < {CPK_LSL} OR d > {CPK_USL}
                       THEN 1 ELSE 0 END) AS BIGINT) AS oos
  FROM lt
),
mo AS (
  SELECT n, oos,
         s1 * 1.0 / n AS mu,
         sqrt((n * 1.0 * s2 - CAST(s1 AS DOUBLE) * s1)
              / ((n * 1.0) * (n - 1))) AS sd
  FROM red
)
SELECT n AS n_lines,
       {sql_round('mu', 4)} AS mean_days,
       {sql_round('sd', 4)} AS sd_days,
       {sql_round(f'({CPK_USL} - {CPK_LSL}) / (6.0 * sd)', 6)} AS cp,
       {sql_round(
           f'LEAST(({CPK_USL} - mu) / (3.0 * sd),'
           f' (mu - {CPK_LSL}) / (3.0 * sd))', 6)} AS cpk,
       {sql_round('oos * 1000000.0 / n', 2)} AS observed_oos_ppm
FROM mo
"""


@register("process_capability", oracle=_B186_ORACLE)
def process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability of order-to-ship lead time against the
    [{CPK_LSL}, {CPK_USL}]-day spec: Cp (what the spread alone
    allows) and Cpk (what the spread plus CENTERING delivers — the
    one customers experience), with the observed out-of-spec ppm.
    Cp >> Cpk means the process is capable but aimed wrong — a
    different fix than B160's out-of-control signals, and the
    prerequisite question before B178's league table shames any
    single supplier.

    Exactness: day moments are exact BIGINTs on the fact-fact key
    join; the indices are O(1) algebra.
    """
    lt = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_shipdate").alias("ship")
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .select(F.datediff("ship", "od").alias("d"))
    )
    red = lt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("s1"),
        F.sum(F.col("d").cast("bigint") * F.col("d"))
        .cast("bigint")
        .alias("s2"),
        F.sum(
            F.when((F.col("d") < CPK_LSL) | (F.col("d") > CPK_USL), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("oos"),
    )
    n = F.col("n")
    mu = F.col("s1") * 1.0 / n
    sd = F.sqrt(
        (n * 1.0 * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
        / ((n * 1.0) * (n - 1))
    )
    return red.select(
        n.alias("n_lines"),
        round_eps(mu, 4).alias("mean_days"),
        round_eps(sd, 4).alias("sd_days"),
        round_eps((CPK_USL - CPK_LSL) / (6.0 * sd), 6).alias("cp"),
        round_eps(
            F.least(
                (CPK_USL - mu) / (3.0 * sd), (mu - CPK_LSL) / (3.0 * sd)
            ),
            6,
        ).alias("cpk"),
        round_eps(F.col("oos") * 1000000.0 / n, 2).alias(
            "observed_oos_ppm"
        ),
    )


# ---------------------------------------------------------------- C175

DH_SEATS = 64

_C175_ORACLE = f"""
WITH mass AS (
  SELECT source, CAST(SUM(len(string_split_regex(lower(text), '\\s+')))
                      AS BIGINT) AS v
  FROM documents GROUP BY source
),
quot AS (
  SELECT source, v, j.j AS j, v * 1.0 / j.j AS q
  FROM mass, (SELECT unnest(generate_series(1, {DH_SEATS})) AS j) j
),
ranked AS (
  SELECT source, v,
         ROW_NUMBER() OVER (ORDER BY q DESC, source, j) AS rk
  FROM quot
),
seats AS (
  SELECT source, MAX(v) AS v,
         CAST(SUM(CASE WHEN rk <= {DH_SEATS} THEN 1 ELSE 0 END)
              AS BIGINT) AS seats
  FROM ranked GROUP BY source
),
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS vt FROM seats)
SELECT source, v AS n_tokens, seats,
       {sql_round(f'{DH_SEATS} * v * 1.0 / vt', 4)} AS ideal_seats,
       {sql_round(f'seats - {DH_SEATS} * v * 1.0 / vt', 4)}
         AS deviation
FROM seats CROSS JOIN tot ORDER BY source
"""


@register("dhondt_shard_allocation", oracle=_C175_ORACLE)
def dhondt_shard_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Hondt apportionment of {DH_SEATS} processing shards across
    sources proportional to token mass: every source gets a WHOLE
    number of shards, the divisor ranking (v/1, v/2, ...) guarantees
    no transfer of one shard between two sources could reduce
    disproportionality — the integer-allocation step after C34's
    shard hashing and B111's rendezvous routing assume a shard count
    per source already exists. Deviation from the fractional ideal
    is reported per source (D'Hondt's known large-party lean).

    Scale shape: token mass is one map-side aggregate; the quotient
    table is |sources| x {DH_SEATS} rows (dimension-scale), one
    global rank window over it, one reduction.
    """
    mass = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+")))
            .cast("bigint")
            .alias("v")
        )
    )
    quot = mass.select(
        "source",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(DH_SEATS))).alias("j"),
    ).select("source", "v", "j", (F.col("v") * 1.0 / F.col("j")).alias("q"))
    ranked = quot.select(
        "source",
        "v",
        F.row_number()
        .over(Window.orderBy(F.col("q").desc(), F.col("source"), F.col("j")))
        .alias("rk"),
    )
    seats = ranked.groupBy("source").agg(
        F.max("v").cast("bigint").alias("v"),
        F.sum(F.when(F.col("rk") <= DH_SEATS, 1).otherwise(0))
        .cast("bigint")
        .alias("seats"),
    )
    w_all = Window.partitionBy()
    out = seats.withColumn("vt", F.sum("v").over(w_all).cast("bigint"))
    ideal = DH_SEATS * F.col("v") * 1.0 / F.col("vt")
    return out.select(
        "source",
        F.col("v").alias("n_tokens"),
        "seats",
        round_eps(ideal, 4).alias("ideal_seats"),
        round_eps(F.col("seats") - ideal, 4).alias("deviation"),
    ).orderBy("source")


# ---------------------------------------------------------------- C176

_C176_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding, label FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS ql,
         v.label AS nl,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {sql_cosine('q.embedding', 'v.embedding')} DESC,
                    v.vec_id) AS rank
  FROM q JOIN v ON q.vec_id <> v.vec_id
),
firsts AS (
  SELECT query_id,
         MIN(CASE WHEN ql = nl THEN rank END) AS first_rel
  FROM scored GROUP BY query_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       {sql_round('AVG(1.0 / first_rel)', 6)} AS mrr,
       {sql_round('AVG(first_rel * 1.0)', 4)} AS mean_first_rank,
       {sql_round(
           'SUM(CASE WHEN first_rel = 1 THEN 1 ELSE 0 END) * 1.0'
           ' / COUNT(*)', 4)} AS p_at_1
FROM firsts
"""


@register("retrieval_mrr", oracle=_C176_ORACLE)
def retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first same-label neighbour for
    the standard query subset: MRR grades the TOP of the ranking —
    the "did the first answer land" metric for RAG and dedup-lookup
    flows — where C116's NDCG@10 spreads credit and C68's accuracy
    votes over 5. Reported with mean first-relevant rank and P@1.

    Scale shape: the same declared all-pairs eval harness as C8
    (fixed small query set; C53's streaming kernel is the
    production swap); one rank window per query, one min per query,
    one reduction.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("ql"),
        F.col("e").alias("eq"),
        F.col("nrm").alias("nq"),
    )
    cos = dot(F.col("eq"), F.col("e")) / (F.col("nq") * F.col("nrm"))
    scored = (
        emb.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("ql"),
            F.col("label").alias("nl"),
            cos.alias("cos"),
            F.col("vec_id").alias("nid"),
        )
        .select(
            "query_id",
            "ql",
            "nl",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("nid")
                )
            )
            .alias("rank"),
        )
    )
    firsts = scored.groupBy("query_id").agg(
        F.min(
            F.when(F.col("ql") == F.col("nl"), F.col("rank"))
        ).alias("first_rel")
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        round_eps(F.avg(1.0 / F.col("first_rel")), 6).alias("mrr"),
        round_eps(F.avg(F.col("first_rel") * 1.0), 4).alias(
            "mean_first_rank"
        ),
        round_eps(
            F.sum(F.when(F.col("first_rel") == 1, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("p_at_1"),
    )
