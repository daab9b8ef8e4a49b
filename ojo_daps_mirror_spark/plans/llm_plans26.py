"""Twenty-sixth sweep (SURVEY.md §2 C85–C86).

Top principal component of the embedding matrix by distributed power
iteration, and Efraimidis–Spirakis deterministic weighted sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C85

PCA_ITERS = 10


def embedding_top_component(
    spark: SparkSession, sf_dir: str, iters: int = PCA_ITERS
):
    """Power iteration for the top principal component of the (centered)
    embedding matrix: v ← normalize(Xᵀ(Xv)), from a deterministic
    all-ones start. Returns (v, eigenvalue_estimate).

    Each iteration is two data passes with NOTHING quadratic: (1) a
    map-side dot xᵢ·v against the broadcast 64-float literal, (2) the
    per-dimension weighted sum Σ xᵢ(xᵢ·v) as ONE posexplode aggregate
    to |dim| rows (collected as the next broadcast — the codebook
    shape). X itself never materialises as a matrix and no shuffle
    exceeds |dim| keys.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    # center: per-dim mean (one posexplode aggregate)
    mean_rows = (
        emb.select(F.posexplode("e").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.avg("x").alias("m"))
        .orderBy("dim")
        .collect()
    )
    mu = np.array([r["m"] for r in mean_rows])
    dim = len(mu)
    v = np.ones(dim) / np.sqrt(dim)
    lam = 0.0
    for _ in range(iters):
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        mu_arr = F.array(*[F.lit(float(x)) for x in mu])
        centered = F.zip_with("e", mu_arr, lambda a, b: a - b)
        proj = F.aggregate(
            F.zip_with(centered, v_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        contrib = (
            emb.select(F.posexplode(F.transform(centered, lambda c: c * proj)).alias("dim", "w"))
            .groupBy("dim")
            .agg(F.sum("w").alias("s"))
            .orderBy("dim")
            .collect()
        )
        w = np.array([r["s"] for r in contrib])
        lam = float(np.linalg.norm(w))
        v = w / lam if lam > 0 else v
    return v, lam


@register("embedding_pca_top")
def embedding_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component + explained variance of the embedding
    corpus (the embedding-space health check: a dominant component
    usually means an uncentered or collapsed space). *rows-only*: the
    iterate is exactness-tested against dense numpy power iteration at
    1e-9 (tests/test_vectors.py shape); sign fixed by forcing the
    first nonzero coordinate positive so the output is deterministic.
    """
    import numpy as np

    v, lam = embedding_top_component(spark, sf_dir)
    if v[np.flatnonzero(np.abs(v) > 1e-12)[0]] < 0:
        v = -v
    rows = [(int(i), float(round(x + 1e-9, 6))) for i, x in enumerate(v)]
    out = spark.createDataFrame(rows, "dim int, loading double")
    return out.withColumn(
        "eigenvalue", F.round(F.lit(lam) + 1e-9, 4)
    ).orderBy("dim")


# ---------------------------------------------------------------- C86

WSAMPLE_K = 100

_C86_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ROUND(pow(
           ({sql_hash64("doc_id::VARCHAR || ':ws'")} % 1000000) / 1000000.0,
           1.0 / n_chars) + 1e-9, 8) AS skey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, skey
FROM keyed
ORDER BY skey DESC, doc_id
LIMIT {WSAMPLE_K}
"""


@register("weighted_sample_es", oracle=_C86_ORACLE)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    A-Res: key = u^(1/w) with u a DETERMINISTIC md5-derived uniform
    (never rand() — reshard-stable, re-runnable), take the top
    {WSAMPLE_K} keys. Long documents (weight = n_chars) are
    proportionally more likely to be kept — the corpus-mixing primitive
    when inclusion probability must follow a quality/length weight.

    Map-side key computation + one TakeOrdered top-k: no sort of the
    corpus, no shuffle beyond the top-k merge. Keys round to 8 dp
    before ranking (doc_id tie-break) so the order is identical across
    engines despite last-ulp pow differences.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))) % 1000000
    ) / 1000000.0
    skey = F.round(F.pow(u, 1.0 / F.col("n_chars")) + 1e-9, 8)
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            skey.alias("skey"),
        )
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(WSAMPLE_K)
    )
