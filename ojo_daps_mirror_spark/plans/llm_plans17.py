"""Seventeenth sweep (SURVEY.md §2 B53, C74).

Nearest-direction as-of join (completing the merge_asof surface) and a
cross-encoder reranking stage with a deterministic stand-in scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.asof import asof_join_nearest
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B53

_B53_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
paired AS (
  SELECT e.event_id, e.user_id, e.ts,
         b.o_orderkey AS bk, b.o_orderdate AS bd,
         f.o_orderkey AS fk, f.o_orderdate AS fd
  FROM events e
  ASOF LEFT JOIN o b ON e.user_id = b.o_custkey AND b.o_orderdate <= e.ts
  ASOF LEFT JOIN o f ON e.user_id = f.o_custkey AND f.o_orderdate > e.ts
),
picked AS (
  SELECT event_id, user_id, ts,
         CASE
           WHEN bd IS NULL AND fd IS NULL THEN 'none'
           WHEN fd IS NULL THEN 'backward'
           WHEN bd IS NULL THEN 'forward'
           WHEN epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts)
             THEN 'backward'
           ELSE 'forward'
         END AS direction,
         CASE
           WHEN bd IS NULL AND fd IS NULL THEN NULL
           WHEN fd IS NULL THEN bk
           WHEN bd IS NULL THEN fk
           WHEN epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts)
             THEN bk ELSE fk
         END AS o_orderkey,
         CASE
           WHEN bd IS NULL AND fd IS NULL THEN NULL
           WHEN fd IS NULL THEN bd
           WHEN bd IS NULL THEN fd
           WHEN epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts)
             THEN bd ELSE fd
         END AS od
  FROM paired
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       direction,
       COALESCE(o_orderkey, -1) AS o_orderkey,
       COALESCE(strftime(od, '%Y-%m-%d'), 'none') AS o_orderdate
FROM picked ORDER BY event_id
"""


@register("as_of_join_nearest", oracle=_B53_ORACLE)
def as_of_join_nearest_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the user's order CLOSEST in time (either
    direction, ties backward) — the third merge_asof direction,
    completing B7 (backward) and B40 (forward).

    One key-shuffle: build rows sort before probes at equal times and
    BOTH candidate carries (last-preceding, first-following) evaluate
    as two frames over the SAME sorted partition — nearest needs no
    second shuffle and no join of two as-of results. The oracle runs
    DuckDB's native backward and forward ASOF joins and applies the
    identical distance rule.
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    both = asof_join_nearest(
        events,
        orders,
        key="user_id",
        probe_time="ts",
        build_time="o_orderdate",
        build_values=["o_orderkey", "o_orderdate"],
        build_key="o_custkey",
    )
    d_back = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("_t_back"))
    d_fwd = F.unix_micros(F.col("_t_fwd")) - F.unix_micros(F.col("ts"))
    back_wins = F.col("_t_fwd").isNull() | (
        F.col("_t_back").isNotNull() & (d_back <= d_fwd)
    )
    direction = (
        F.when(F.col("_t_back").isNull() & F.col("_t_fwd").isNull(), "none")
        .when(back_wins, "backward")
        .otherwise("forward")
    )
    pick = lambda b, f: (  # noqa: E731
        F.when(direction == "backward", b).when(direction == "forward", f)
    )
    return both.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        direction.alias("direction"),
        F.coalesce(
            pick(F.col("o_orderkey_back"), F.col("o_orderkey_fwd")), F.lit(-1)
        ).alias("o_orderkey"),
        F.coalesce(
            F.date_format(
                pick(F.col("o_orderdate_back"), F.col("o_orderdate_fwd")),
                "yyyy-MM-dd",
            ),
            F.lit("none"),
        ).alias("o_orderdate"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- C74

RERANK_CANDIDATES = 20
RERANK_TOP = 5
_RERANK_QUERY_ID = 7  # fixed query identity folded into the stub score


def _stub_score_sql(doc: str) -> str:
    expr = f"{_RERANK_QUERY_ID} || ':' || ({doc})"
    return f"({sql_hash64(expr)} % 10000) / 10000.0"


_C74_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1
  FROM documents
),
cand AS (SELECT doc_id, r1 FROM lens WHERE r1 <= {RERANK_CANDIDATES}),
scored AS (
  SELECT doc_id, r1 AS first_stage_rank,
         {_stub_score_sql('doc_id::VARCHAR')} AS ce_score
  FROM cand
)
SELECT doc_id, first_stage_rank,
       {sql_round('ce_score', 4)} AS ce_score,
       CAST(row_number() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT)
         AS final_rank
FROM scored
QUALIFY final_rank <= {RERANK_TOP}
ORDER BY final_rank
"""


@register("rerank_stub", oracle=_C74_ORACLE)
def rerank_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval reranking: a cheap first stage produces
    {RERANK_CANDIDATES} candidates (here: longest-document ranking as
    the stand-in retriever), then an expensive "cross-encoder" rescores
    ONLY those candidates and the top {RERANK_TOP} re-sort by the new
    score — the universal retrieve-then-rerank shape.

    Like A14/C11, the external model is stubbed with a deterministic
    hash score (same md5 math in the oracle) while the Spark plumbing
    is real and the part that matters at scale: the rerank stage's cost
    is O(candidates), never O(corpus) — the plan must show the top-k
    candidate cut (TakeOrdered/WindowGroupLimit) BEFORE the scoring
    projection, so a swapped-in real model UDF would also only see
    {RERANK_CANDIDATES} rows.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w1 = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    cand = (
        docs.withColumn("first_stage_rank", F.row_number().over(w1))
        .where(F.col("first_stage_rank") <= RERANK_CANDIDATES)
        .select("doc_id", "first_stage_rank")
    )
    ce = (
        hash64(
            F.concat(
                F.lit(str(_RERANK_QUERY_ID)),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        )
        % 10000
    ) / 10000.0
    w2 = Window.orderBy(F.desc("ce_score_raw"), F.asc("doc_id"))
    return (
        cand.withColumn("ce_score_raw", ce)
        .withColumn("final_rank", F.row_number().over(w2).cast("bigint"))
        .where(F.col("final_rank") <= RERANK_TOP)
        .select(
            "doc_id",
            "first_stage_rank",
            round_eps(F.col("ce_score_raw"), 4).alias("ce_score"),
            "final_rank",
        )
        .orderBy("final_rank")
    )
