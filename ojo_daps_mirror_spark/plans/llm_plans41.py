"""Forty-first sweep (SURVEY.md §2 C100–C102).

The training-mixture manifest (quality gate × temperature rates ×
token budgets composed into the run sheet a pretraining job consumes),
Johnson–Lindenstrauss random projection with distance-distortion
audit, and length-bucketed batch construction with padding-waste
accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64, sql_tokens, tokens
from ..sources import load_table
from . import register
from .llm_plans3 import MIX_ALPHA

# ---------------------------------------------------------------- C100

GATE_MIN_CHARS, GATE_MAX_CHARS = 200, 20_000

_C100_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         CASE WHEN length(text) BETWEEN {GATE_MIN_CHARS} AND {GATE_MAX_CHARS}
              THEN 'keep' ELSE 'drop' END AS gate,
         CAST(len(list_filter({sql_tokens('text')}, t -> t <> '')) AS BIGINT)
           AS n_tok
  FROM documents
),
lang_counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY lang
),
rates AS (
  SELECT lang,
         100 * POW((SELECT MIN(n) FROM lang_counts)::DOUBLE / n,
                   {1 - MIX_ALPHA}) AS rate
  FROM lang_counts
),
cells AS (
  SELECT lang, gate,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
  FROM scored GROUP BY 1, 2
)
SELECT c.lang, c.gate, c.n_docs, c.n_tokens,
       {sql_round('r.rate', 4)} AS sample_rate,
       CASE WHEN c.gate = 'keep'
            THEN CAST(ROUND(c.n_tokens * r.rate / 100) AS BIGINT)
            ELSE 0 END AS expected_tokens
FROM cells c JOIN rates r USING (lang)
ORDER BY c.lang, c.gate
"""


@register("training_mixture_manifest", oracle=_C100_ORACLE)
def training_mixture_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-mixture MANIFEST: per (language, quality-gate)
    cell — document count, token count, the C33 temperature sampling
    rate, and the expected post-sampling token budget. This is the
    run sheet a pretraining data job actually consumes (how many
    tokens each slice contributes), composing the quality gate, the
    mixing policy, and token accounting into one frame.

    Scale shape: ONE corpus scan computes gate + token counts
    map-side; everything downstream ((lang,gate) cells, |langs|-row
    rates, the manifest join) is dimension-grain. At 100 TB the scan
    is the only data-volume stage — exactly the two-aggregate shape
    of C33 with the gate fused into the same pass.
    """
    scored = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.when(
            F.length("text").between(GATE_MIN_CHARS, GATE_MAX_CHARS), "keep"
        )
        .otherwise("drop")
        .alias("gate"),
        F.size(F.filter(tokens(F.col("text")), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tok"),
    )
    lang_counts = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    rates = lang_counts.select(
        "lang",
        (
            100
            * F.pow(
                F.min("n").over(w_all).cast("double") / F.col("n"), 1 - MIX_ALPHA
            )
        ).alias("rate"),
    )
    cells = scored.groupBy("lang", "gate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    return (
        cells.join(F.broadcast(rates), "lang")
        .select(
            "lang",
            "gate",
            "n_docs",
            "n_tokens",
            round_eps(F.col("rate"), 4).alias("sample_rate"),
            F.when(
                F.col("gate") == "keep",
                F.round(F.col("n_tokens") * F.col("rate") / 100).cast("bigint"),
            )
            .otherwise(0)
            .alias("expected_tokens"),
        )
        .orderBy("lang", "gate")
    )


# ---------------------------------------------------------------- C101

JL_R = 16  # target dimensionality (from 64)


def _sql_fold_sum(items: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, {items}), (a, b) -> a + b)"
    )


_C101_ORACLE = f"""
WITH signs AS (
  SELECT i.i, j.j,
         CASE WHEN ({sql_hash64("i.i::VARCHAR || '_' || j.j::VARCHAR")}) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM unnest(generate_series(1, 64)) AS i(i)
  CROSS JOIN unnest(generate_series(1, {JL_R})) AS j(j)
),
comp AS (
  SELECT e.vec_id, s.j,
         CAST(ROUND(SUM((e.embedding::DOUBLE[])[s.i] * s.s)
                    / sqrt({JL_R}.0) * 1e6) AS BIGINT) AS y6
  FROM embeddings e JOIN signs s ON TRUE
  GROUP BY e.vec_id, s.j
),
proj AS (
  SELECT vec_id, list(y6 / 1e6 ORDER BY j) AS y FROM comp GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id1,
         {_sql_fold_sum(
             "list_transform(generate_series(1, 64), "
             "k -> ((a.embedding::DOUBLE[])[k] - (b.embedding::DOUBLE[])[k])"
             " * ((a.embedding::DOUBLE[])[k] - (b.embedding::DOUBLE[])[k]))")}
           AS d_orig,
         {_sql_fold_sum(
             f"list_transform(generate_series(1, {JL_R}), "
             "k -> (pa.y[k] - pb.y[k]) * (pa.y[k] - pb.y[k]))")} AS d_proj
  FROM embeddings a
  JOIN embeddings b ON b.vec_id = a.vec_id + 1
  JOIN proj pa ON pa.vec_id = a.vec_id
  JOIN proj pb ON pb.vec_id = b.vec_id
),
dist AS (
  SELECT CAST(ROUND(abs(d_proj / d_orig - 1.0) * 1e6) AS BIGINT) AS dist6
  FROM pairs WHERE d_orig > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {sql_round('SUM(dist6) * 1.0 / COUNT(*) / 1e6', 4)} AS mean_distortion,
       {sql_round('MAX(dist6) / 1e6', 4)} AS max_distortion
FROM dist
"""


@register("jl_projection_distortion", oracle=_C101_ORACLE)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→{JL_R} dims with a
    distance-distortion audit over consecutive-id vector pairs — the
    cheap dimensionality reduction used in front of ANN indexes and
    sketches, with the ±1 Achlioptas sign matrix derived from md5 (no
    RNG: the projection is reproducible across engines, runs, and
    reshards).

    Scale shape: the sign matrix is a 64×{JL_R} FRAME built from
    sequences and broadcast; projection is one explode-join-aggregate
    at (vec, j) grain (map-side combined); distances fold arrays in
    identical order; projected components and distortions quantise to
    integer micro-units so pair aggregates are exact.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    signs = (
        spark.range(0, 64 * JL_R)
        .select(
            (F.col("id") / JL_R + 1).cast("bigint").alias("i"),
            (F.col("id") % JL_R + 1).cast("bigint").alias("j"),
        )
        .select(
            "i",
            "j",
            F.when(
                hash64(
                    F.concat(
                        F.col("i").cast("string"), F.lit("_"), F.col("j").cast("string")
                    )
                )
                % 2
                == 0,
                1.0,
            )
            .otherwise(-1.0)
            .alias("s"),
        )
    )
    comp = (
        emb.select("vec_id", F.posexplode("e").alias("i0", "x"))
        .select("vec_id", (F.col("i0") + 1).alias("i"), "x")
        .join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(
            F.round(F.sum(F.col("x") * F.col("s")) / F.sqrt(F.lit(float(JL_R))) * 1e6)
            .cast("bigint")
            .alias("y6")
        )
    )
    proj = comp.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "y6"))),
            lambda st: st["y6"] / 1e6,
        ).alias("y")
    )

    def sqdist(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = emb.select(F.col("vec_id").alias("id1"), F.col("e").alias("e1"))
    b = emb.select((F.col("vec_id") - 1).alias("id1"), F.col("e").alias("e2"))
    pa = proj.select(F.col("vec_id").alias("id1"), F.col("y").alias("y1"))
    pb = proj.select((F.col("vec_id") - 1).alias("id1"), F.col("y").alias("y2"))
    pairs = (
        a.join(b, "id1")
        .join(pa, "id1")
        .join(pb, "id1")
        .select(
            sqdist(F.col("e1"), F.col("e2")).alias("d_orig"),
            sqdist(F.col("y1"), F.col("y2")).alias("d_proj"),
        )
        .where(F.col("d_orig") > 0)
        .select(
            F.round(F.abs(F.col("d_proj") / F.col("d_orig") - 1.0) * 1e6)
            .cast("bigint")
            .alias("dist6")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        round_eps(F.sum("dist6") * 1.0 / F.count(F.lit(1)) / 1e6, 4).alias(
            "mean_distortion"
        ),
        round_eps(F.max("dist6") / 1e6, 4).alias("max_distortion"),
    )


# ---------------------------------------------------------------- C102

BATCH_DOCS = 8  # docs per batch within a length bucket

_C102_ORACLE = f"""
WITH lens AS (
  SELECT doc_id,
         CAST(len(list_filter({sql_tokens('text')}, t -> t <> '')) AS BIGINT)
           AS n_tok
  FROM documents
),
bucketed AS (
  SELECT doc_id, n_tok,
         CAST(length(bin(greatest(n_tok, 1))) - 1 AS BIGINT) AS bucket,
         ROW_NUMBER() OVER (
           PARTITION BY length(bin(greatest(n_tok, 1))) - 1
           ORDER BY doc_id) AS rn
  FROM lens
),
batches AS (
  SELECT bucket, CAST((rn - 1) // {BATCH_DOCS} AS BIGINT) AS batch_id,
         n_tok
  FROM bucketed
)
SELECT bucket, batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_tok) AS BIGINT) AS max_len,
       CAST(SUM(n_tok) AS BIGINT) AS sum_len,
       CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS pad_waste,
       {sql_round('SUM(n_tok) * 1.0 / (COUNT(*) * MAX(n_tok))', 4)}
         AS efficiency
FROM batches GROUP BY bucket, batch_id
ORDER BY bucket, batch_id
"""


@register("length_bucketed_batches", oracle=_C102_ORACLE)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch construction with padding-waste
    accounting: docs bucket by power-of-two token length (exponent
    via the BINARY-STRING length — exact integer both engines, no
    log2 float edge), batch deterministically by id within the
    bucket, and each batch reports its pad waste n·max−Σ and packing
    efficiency — the dynamic-batching prep that decides real training
    throughput (the complement of C44's sequence packing: bucketing
    bounds padding without reordering tokens).

    Scale shape: token counts map-side; the ONLY shuffle is the
    bucket-partitioned row_number (distributes on the bucket key, and
    at 100 TB you'd sub-salt the hot middle buckets); batch stats are
    a (bucket, batch) aggregate. Integer math throughout.
    """
    lens = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(tokens(F.col("text")), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tok"),
    )
    bucket = (F.length(F.bin(F.greatest(F.col("n_tok"), F.lit(1)))) - 1).cast(
        "bigint"
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    batches = lens.withColumn("bucket", bucket).select(
        "bucket",
        "n_tok",
        F.floor((F.row_number().over(w) - 1) / BATCH_DOCS)
        .cast("bigint")
        .alias("batch_id"),
    )
    return (
        batches.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_len"),
            F.sum("n_tok").cast("bigint").alias("sum_len"),
            (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
            .cast("bigint")
            .alias("pad_waste"),
            round_eps(
                F.sum("n_tok") * 1.0 / (F.count(F.lit(1)) * F.max("n_tok")), 4
            ).alias("efficiency"),
        )
        .orderBy("bucket", "batch_id")
    )
