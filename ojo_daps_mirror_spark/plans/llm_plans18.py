"""Eighteenth sweep (SURVEY.md §2 C75).

Scalar int8 embedding quantization — the storage-side companion to
C28's product quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C75

_C75_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, i AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
),
stats AS (
  SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM ex GROUP BY dim
),
coded AS (
  SELECT ex.vec_id, ex.x,
         CASE WHEN hi = lo THEN 0
              ELSE round((ex.x - lo) * 255.0 / (hi - lo) + 1e-9)::BIGINT
         END AS code,
         lo, hi
  FROM ex JOIN stats USING (dim)
),
recon AS (
  SELECT vec_id, x,
         CASE WHEN hi = lo THEN lo
              ELSE lo + code * (hi - lo) / 255.0 END AS xr
  FROM coded
)
SELECT vec_id,
       {sql_round('AVG((x - xr) * (x - xr))', 10)} AS mse,
       {sql_round('MAX(ABS(x - xr))', 8)} AS max_err
FROM recon GROUP BY vec_id ORDER BY vec_id
"""


@register("embedding_quantize_int8", oracle=_C75_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column (per-dimension
    min/max affine codes — 4x storage cut, the cheap sibling of C28's
    PQ) with per-vector reconstruction error as the output contract.

    Per-dim stats come from ONE posexplode aggregate to a |dim|-row
    frame (64 rows) that broadcasts back as two ARRAY LITERALS folded
    into a zip_with — encode+reconstruct+error is then a single
    map-side pass over the original vectors, nothing at vector grain
    crosses a shuffle. (The two-scalar-arrays broadcast is exactly how
    a serving encoder ships its calibration.)
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    stats = (
        emb.select(F.posexplode("e").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("dim")
    )
    # dim-indexed calibration arrays (|dim| scalars) via one collect —
    # the standard broadcast-codebook shape shared with C28/C29
    rows = stats.collect()
    lo = [r["lo"] for r in rows]
    hi = [r["hi"] for r in rows]
    lo_arr = F.array(*[F.lit(v) for v in lo])
    hi_arr = F.array(*[F.lit(v) for v in hi])

    def recon(x, l, h):
        code = F.when(h == l, F.lit(0.0)).otherwise(
            F.round((x - l) * 255.0 / (h - l) + 1e-9)
        )
        return F.when(h == l, l).otherwise(l + code * (h - l) / 255.0)

    err = F.zip_with(
        F.col("e"),
        F.zip_with(lo_arr, hi_arr, lambda l, h: F.struct(l.alias("l"), h.alias("h"))),
        lambda x, s: F.struct(
            ((x - recon(x, s["l"], s["h"])) * (x - recon(x, s["l"], s["h"]))).alias(
                "sq"
            ),
            F.abs(x - recon(x, s["l"], s["h"])).alias("ab"),
        ),
    )
    return (
        emb.withColumn("err", err)
        .select(
            "vec_id",
            round_eps(
                F.aggregate(
                    F.col("err"), F.lit(0.0), lambda a, s: a + s["sq"]
                )
                / F.size("err"),
                10,
            ).alias("mse"),
            round_eps(
                F.array_max(F.transform(F.col("err"), lambda s: s["ab"])), 8
            ).alias("max_err"),
        )
        .orderBy("vec_id")
    )
