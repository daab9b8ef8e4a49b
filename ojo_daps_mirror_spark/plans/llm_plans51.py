"""Fifty-first sweep (SURVEY.md §2 B101-B102, C113).

Operational join diagnostics — a per-key skew profile and a
sketch-style join-cardinality probe (the "estimate before you join"
pre-flight pair next to D14's AQE behavior and C112's LSH QC) — and
the pack-grain loader manifest with document boundary offsets
completing C35's packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from .. import scale_mode as sm
from . import register
from .llm_plans3 import PACK_BUCKETS, PACK_CAP

# ---------------------------------------------------------------- B101

SKEW_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
)


def _b101_one_sql(table: str, key: str) -> str:
    return f"""
SELECT '{table}.{key}' AS join_key,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_cnt,
       {sql_round('SUM(c) * 1.0 / COUNT(*)', 4)} AS avg_cnt,
       {sql_round('MAX(c) * COUNT(*) * 1.0 / SUM(c)', 4)} AS skew_ratio,
       CAST(ROUND(quantile_cont(c, 0.99) + 1e-9) AS BIGINT) AS p99_cnt
FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)
"""


_B101_ORACLE = (
    " UNION ALL ".join(_b101_one_sql(t, k) for t, k in SKEW_KEYS)
    + " ORDER BY join_key"
)


@register("join_skew_report", oracle=_B101_ORACLE)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-join-key skew profile (key count, row count, hottest key,
    skew ratio max/avg, p99 key size) for every fact join key — the
    diagnostic that says WHICH join needs B14's salting or will
    trigger D14's AQE skew split BEFORE the job runs. A skew_ratio
    near 1 is uniform; the reducer wall-clock of an unsalted join is
    proportional to max_cnt, not avg_cnt.

    Scale shape: one map-side-combined key-grain aggregate per key
    (the same shuffle the real join would pay, minus the other side),
    then a scalar profile over each key-count table; the report is
    |keys_profiled| rows. The exact p99 swaps to approx_percentile at
    100 TB — executable via SPARK_GRAFT_SCALE_MODE=approx
    (scale_mode.py).
    """
    outs = []
    for table, key in SKEW_KEYS:
        c = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        outs.append(
            c.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("c").cast("bigint").alias("n_rows"),
                F.max("c").cast("bigint").alias("max_cnt"),
                round_eps(F.sum("c") * 1.0 / F.count(F.lit(1)), 4).alias(
                    "avg_cnt"
                ),
                round_eps(
                    F.max("c") * F.count(F.lit(1)) * 1.0 / F.sum("c"), 4
                ).alias("skew_ratio"),
                F.round(sm.percentile("c", 0.99) + 1e-9)
                .cast("bigint")
                .alias("p99_cnt"),
            ).select(F.lit(f"{table}.{key}").alias("join_key"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("join_key")


# ---------------------------------------------------------------- B102

_B102_ORACLE = f"""
WITH lo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
ll AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
probe1 AS (
  SELECT 'orders*lineitem@orderkey' AS join_pair,
         CAST(SUM(lo.c * ll.c) AS BIGINT) AS predicted_rows,
         CAST(MAX(lo.c * ll.c) AS BIGINT) AS max_key_rows
  FROM lo JOIN ll USING (k)
),
actual1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
co AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
oo AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
probe2 AS (
  SELECT 'customer*orders@custkey' AS join_pair,
         CAST(SUM(co.c * oo.c) AS BIGINT) AS predicted_rows,
         CAST(MAX(co.c * oo.c) AS BIGINT) AS max_key_rows
  FROM co JOIN oo USING (k)
),
actual2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
  FROM customer JOIN orders ON c_custkey = o_custkey
)
SELECT p.join_pair, p.predicted_rows, a.actual_rows, p.max_key_rows
FROM probe1 p CROSS JOIN actual1 a
UNION ALL
SELECT p.join_pair, p.predicted_rows, a.actual_rows, p.max_key_rows
FROM probe2 p CROSS JOIN actual2 a
ORDER BY join_pair
"""


@register("join_cardinality_probe", oracle=_B102_ORACLE)
def join_cardinality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality probe: predict |A⋈B| = Σ_k a_k·b_k from the
    two KEY-COUNT tables before running the join, plus the largest
    single-key contribution (the task that would OOM) — and the actual
    join count as the audit column (equality is the exactness proof;
    in production you run only the probe). The planning primitive for
    "will this join explode": two key-grain aggregates cost far less
    than one wrong full join at 100 TB.

    Scale shape: per probed pair, two map-side-combined key-count
    aggregates and a KEY-GRAIN join of the two count tables (dim-scale
    rows, integer products) — fact rows never meet each other.
    """

    def probe(left, lk, right, rk, label):
        lo = (
            load_table(spark, sf_dir, left)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cl"))
        )
        ro = (
            load_table(spark, sf_dir, right)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cr"))
        )
        pred = lo.join(ro, "k").agg(
            F.sum(F.col("cl") * F.col("cr")).cast("bigint").alias(
                "predicted_rows"
            ),
            F.max(F.col("cl") * F.col("cr")).cast("bigint").alias(
                "max_key_rows"
            ),
        )
        actual = (
            load_table(spark, sf_dir, left)
            .join(
                load_table(spark, sf_dir, right),
                F.col(lk) == F.col(rk),
            )
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        return pred.transform(scalars(actual)).select(
            F.lit(label).alias("join_pair"),
            "predicted_rows",
            "actual_rows",
            "max_key_rows",
        )

    return (
        probe("orders", "o_orderkey", "lineitem", "l_orderkey",
              "orders*lineitem@orderkey")
        .unionByName(
            probe("customer", "c_custkey", "orders", "o_custkey",
                  "customer*orders@custkey")
        )
        .orderBy("join_pair")
    )


# ---------------------------------------------------------------- C113

_C113_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,
         CAST(len({sql_tokens("text")}) AS BIGINT) AS n_tok
  FROM documents
),
runs AS (
  SELECT doc_id, bucket, n_tok,
         SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM sized
),
placed AS (
  SELECT bucket, doc_id, n_tok,
         CAST(FLOOR((cum - n_tok) / {PACK_CAP}.0) AS BIGINT) AS seq_id,
         cum - n_tok - CAST(FLOOR((cum - n_tok) / {PACK_CAP}.0) AS BIGINT)
           * {PACK_CAP} AS start
  FROM runs
)
SELECT bucket, seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       {sql_round(f'SUM(n_tok) * 1.0 / {PACK_CAP}', 4)} AS fill_ratio,
       string_agg(doc_id || ':' || start || ':' || (start + n_tok),
                  ',' ORDER BY doc_id) AS boundaries
FROM placed GROUP BY bucket, seq_id ORDER BY bucket, seq_id
"""


@register("pack_with_boundaries", oracle=_C113_ORACLE)
def pack_with_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pack-grain loader manifest completing C35's doc-grain
    assignment: per training sequence its document count, token count,
    fill ratio and the 'doc:start:end' boundary offsets the attention
    mask needs (cross-document attention masking / EOS insertion both
    consume exactly this table). Same streaming pack-then-spill rule
    as C35, so a spill doc's end offset may exceed the cap — by
    design (its tail is what spills).

    Scale shape: identical single running-sum window per hash bucket
    as C35, then ONE (bucket, seq) aggregate with an ordered
    string_agg (bounded by docs-per-pack, not corpus size).
    """
    sized = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = sized.withColumn("cum", F.sum("n_tok").over(w))
    seq_id = F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_CAP)).cast(
        "bigint"
    )
    placed = runs.select(
        "bucket",
        "doc_id",
        "n_tok",
        seq_id.alias("seq_id"),
        (F.col("cum") - F.col("n_tok") - seq_id * PACK_CAP).alias("start"),
    )
    bound = F.concat_ws(
        ":",
        F.col("doc_id"),
        F.col("start"),
        (F.col("start") + F.col("n_tok")),
    )
    return (
        placed.select("bucket", "seq_id", "n_tok", "doc_id", bound.alias("b"))
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            round_eps(F.sum("n_tok") * 1.0 / PACK_CAP, 4).alias("fill_ratio"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "b"))
                    ),
                    lambda s: s["b"],
                ),
                ",",
            ).alias("boundaries"),
        )
        .orderBy("bucket", "seq_id")
    )
