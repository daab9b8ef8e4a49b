"""Sixty-fourth sweep (SURVEY.md §2 B119, C134-C135).

Relational division (the for-ALL join shape missing from the join
family — every other join here is for-SOME), a collision audit of the
engine's own 60-bit hash64 key scheme against the birthday bound (the
soundness check behind EVERY hashed shuffle key in this repo), and
per-cluster embedding centroid drift between corpus halves (the
embedding-space counterpart of C125's PSI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B119

_B119_ORACLE = f"""
WITH n_prio AS (
  SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_all
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
  FROM orders GROUP BY 1
),
flagged AS (
  SELECT p.o_custkey,
         CASE WHEN p.n_prio = t.n_all THEN 1 ELSE 0 END AS complete
  FROM per_cust p CROSS JOIN n_prio t
)
SELECT c.c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(f.complete) AS BIGINT) AS n_complete,
       {sql_round('SUM(f.complete) * 1.0 / COUNT(*)', 6)}
         AS completeness_rate
FROM flagged f JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


@register("relational_division", oracle=_B119_ORACLE)
def relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — customers whose orders cover EVERY
    priority class, rolled up per nation: the for-ALL join shape
    (suppliers stocking all parts, users hitting every funnel step)
    that no equi/semi/anti join expresses directly. Implemented the
    scalable way: per-customer COUNT(DISTINCT class) compared to the
    global class count — not the textbook double-NOT-EXISTS, which
    plans as a nested anti-join per candidate row.

    Scale shape: one fact-grain distinct-aggregate (map-side partial
    on the (cust, class) pair), the 1-row divisor attaches broadcast,
    and the nation rollup rides a broadcast customer-dim join. No
    per-row subqueries anywhere.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    n_prio = orders.agg(
        F.countDistinct("o_orderpriority").cast("bigint").alias("n_all")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").cast("bigint").alias("n_prio")
    )
    flagged = per_cust.transform(scalars(n_prio)).select(
        "o_custkey",
        F.when(F.col("n_prio") == F.col("n_all"), 1).otherwise(0).alias(
            "complete"
        ),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return (
        flagged.join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("complete").cast("bigint").alias("n_complete"),
            round_eps(
                F.sum("complete") * 1.0 / F.count(F.lit(1)), 6
            ).alias("completeness_rate"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------- C134

HASH_SPACE = float(1 << 60)  # hash64 = 15 hex chars = 60 bits

_C134_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split_regex(lower(text), '\\s+')) AS k
  FROM documents
),
tok_audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(DISTINCT {sql_hash64('k')}) AS BIGINT) AS n_hashes
  FROM toks WHERE k <> ''
),
doc_audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(DISTINCT {sql_hash64("'d:' || doc_id::VARCHAR")})
              AS BIGINT) AS n_hashes
  FROM documents
),
pair_audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(DISTINCT {sql_hash64(
             "user_id::VARCHAR || '#' || event_id::VARCHAR")})
              AS BIGINT) AS n_hashes
  FROM events
),
u AS (
  SELECT 'doc_ids' AS entity, * FROM doc_audit
  UNION ALL SELECT 'event_pairs', * FROM pair_audit
  UNION ALL SELECT 'tokens', * FROM tok_audit
)
SELECT entity, n_keys, n_hashes,
       CAST(n_keys - n_hashes AS BIGINT) AS collisions,
       {sql_round(
           'n_keys * (n_keys - 1) / 2.0 / ' + repr(HASH_SPACE), 6)}
         AS expected_collisions
FROM u ORDER BY entity
"""


@register("hash_collision_audit", oracle=_C134_ORACLE)
def hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of the engine's own 60-bit hash64 key scheme
    (the md5-prefix surrogate behind every dedup/shuffle/split key in
    this repo, and the analog of the reference's md5 short-hash SOC
    surrogate, pre_enrich/soc_lookup.py): for token vocabulary,
    doc-id and (user,event) composite keys — observed distinct-hash
    shortfall vs the birthday-bound expectation n(n−1)/2^61. A
    surrogate-key scheme without a collision audit is an unverified
    assumption; at 100 TB vocabularies (~1e9 keys) the 60-bit bound
    predicts ~0.4 collisions, and THIS query is the one you run to
    decide when to widen to 128 bits.

    Scale shape: three independent distinct-aggregates (each a
    map-side-combined COUNT DISTINCT pair — key and hash counted in
    the same pass); the union is 3 rows. The token audit shares C1's
    tokenise-explode shape.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("k")
        )
        .where(F.col("k") != "")
        .distinct()
    )
    tok_audit = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.countDistinct(hash64(F.col("k"))).cast("bigint").alias("n_hashes"),
    ).withColumn("entity", F.lit("tokens"))
    doc_audit = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.countDistinct(
                hash64(F.concat(F.lit("d:"), F.col("doc_id").cast("string")))
            )
            .cast("bigint")
            .alias("n_hashes"),
        )
        .withColumn("entity", F.lit("doc_ids"))
    )
    pair_audit = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.countDistinct(
                hash64(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("#"),
                        F.col("event_id").cast("string"),
                    )
                )
            )
            .cast("bigint")
            .alias("n_hashes"),
        )
        .withColumn("entity", F.lit("event_pairs"))
    )
    cols = ["entity", "n_keys", "n_hashes"]
    u = (
        doc_audit.select(cols)
        .unionByName(pair_audit.select(cols))
        .unionByName(tok_audit.select(cols))
    )
    return u.select(
        "entity",
        "n_keys",
        "n_hashes",
        (F.col("n_keys") - F.col("n_hashes")).cast("bigint").alias(
            "collisions"
        ),
        round_eps(
            F.col("n_keys") * (F.col("n_keys") - 1) / 2.0 / HASH_SPACE, 6
        ).alias("expected_collisions"),
    ).orderBy("entity")


# ---------------------------------------------------------------- C135

_C135_ORACLE = f"""
WITH dims AS (
  SELECT label, vec_id % 2 AS half,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
per_dim AS (
  SELECT label, dim,
         AVG(v) FILTER (WHERE half = 0) AS mu_a,
         AVG(v) FILTER (WHERE half = 1) AS mu_b,
         COUNT(*) FILTER (WHERE half = 0) AS n_a,
         COUNT(*) FILTER (WHERE half = 1) AS n_b
  FROM dims GROUP BY label, dim
)
SELECT label,
       CAST(MIN(n_a) AS BIGINT) AS n_a,
       CAST(MIN(n_b) AS BIGINT) AS n_b,
       {sql_round(
           'SUM(mu_a * mu_b) / (SQRT(SUM(mu_a * mu_a))'
           ' * SQRT(SUM(mu_b * mu_b)))', 4)} AS centroid_cos,
       {sql_round(
           'SQRT(SUM((mu_a - mu_b) * (mu_a - mu_b)))', 4)} AS centroid_l2
FROM per_dim GROUP BY label ORDER BY label
"""


@register("embedding_centroid_drift", oracle=_C135_ORACLE)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding centroid drift between two corpus halves
    (vec_id parity standing in for old/new ingest batches): cosine
    and L2 distance between each label's half-A and half-B centroids
    — the embedding-space drift monitor (C125's PSI watches a scalar
    distribution; THIS catches the semantic drift that arrives with a
    new crawl snapshot or an encoder version bump, where per-scalar
    stats look unchanged). Centroid cos near 1 = stable cluster;
    drops flag re-clustering before C132's labels go stale.

    Scale shape: one posexplode to (label, half, dim) grain — 64
    rows per vector — then ONE aggregate with conditional partials
    per half; everything after lives at |labels|·64. At 100 TB the
    explode trades for the C53 streaming-BLAS mapInPandas kernel
    (per-batch partial centroid sums), same downstream frame.
    """
    dims = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim0", "v"),
    )
    per_dim = dims.groupBy("label", "dim0").agg(
        F.avg(F.when(F.col("half") == 0, F.col("v").cast("double"))).alias(
            "mu_a"
        ),
        F.avg(F.when(F.col("half") == 1, F.col("v").cast("double"))).alias(
            "mu_b"
        ),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.min("n_a").cast("bigint").alias("n_a"),
            F.min("n_b").cast("bigint").alias("n_b"),
            round_eps(
                F.sum(F.col("mu_a") * F.col("mu_b"))
                / (
                    F.sqrt(F.sum(F.col("mu_a") * F.col("mu_a")))
                    * F.sqrt(F.sum(F.col("mu_b") * F.col("mu_b")))
                ),
                4,
            ).alias("centroid_cos"),
            round_eps(
                F.sqrt(
                    F.sum(
                        (F.col("mu_a") - F.col("mu_b"))
                        * (F.col("mu_a") - F.col("mu_b"))
                    )
                ),
                4,
            ).alias("centroid_l2"),
        )
        .orderBy("label")
    )
