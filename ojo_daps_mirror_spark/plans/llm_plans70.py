"""Seventieth sweep (SURVEY.md §2 B129, C142-C143).

Simpson's-paradox audit (does the per-segment correlation contradict
the pooled one — the aggregation trap behind half of all dashboard
misreads), a context-length packing frontier (tokens wasted vs
max_len across candidate context windows — the capacity-planning
curve for C49/C85's packers), and an embedding isotropy score via the
one-pass ||Σu||² identity (anisotropic embeddings break cosine
retrieval — the geometry health check in front of the ANN family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B129

_B129_ORACLE = f"""
WITH vals AS (
  SELECT l_returnflag AS seg,
         CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
per_seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM vals GROUP BY seg
),
pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sx) AS BIGINT) AS sx, CAST(SUM(sy) AS BIGINT) AS sy,
         CAST(SUM(sxx) AS HUGEINT) AS sxx,
         CAST(SUM(sxy) AS HUGEINT) AS sxy,
         CAST(SUM(syy) AS HUGEINT) AS syy
  FROM per_seg
),
rs AS (
  SELECT s.seg, s.n,
         (s.n * s.sxy - CAST(s.sx AS HUGEINT) * s.sy) * 1.0
           / sqrt((s.n * s.sxx - CAST(s.sx AS HUGEINT) * s.sx) * 1.0
                  * (s.n * s.syy - CAST(s.sy AS HUGEINT) * s.sy)) AS r_seg,
         (p.n * p.sxy - CAST(p.sx AS HUGEINT) * p.sy) * 1.0
           / sqrt((p.n * p.sxx - CAST(p.sx AS HUGEINT) * p.sx) * 1.0
                  * (p.n * p.syy - CAST(p.sy AS HUGEINT) * p.sy)) AS r_all
  FROM per_seg s CROSS JOIN pooled p
)
SELECT seg, n, {sql_round('r_seg', 6)} AS r_segment,
       {sql_round('r_all', 6)} AS r_pooled,
       CAST(CASE WHEN (r_seg > 0) <> (r_all > 0) THEN 1 ELSE 0 END
            AS BIGINT) AS sign_flip
FROM rs ORDER BY seg
"""


@register("simpson_paradox_audit", oracle=_B129_ORACLE)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the price↔quantity Pearson r within
    each return-flag segment next to the POOLED r, flagging segments
    whose correlation sign contradicts the aggregate — the
    aggregation trap where a relationship reverses when a lurking
    segment variable is collapsed (the reason B56's global
    correlation matrix must not be read as per-segment truth). Run
    before trusting any pooled correlation from B55/B56/B57.

    Scale shape: ONE fact-grain aggregate to per-segment sufficient
    statistics; the pooled stats derive from those partials (no
    second scan) and attach broadcast. Σx² of cent values needs
    128-bit accumulation — HUGEINT in DuckDB, and Spark's decimal
    path via sum of DECIMAL(38,0) on the same exact integers.
    """
    vals = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("seg"),
        F.round(F.col("l_extendedprice") * 100 + 1e-9)
        .cast("decimal(38,0)")
        .alias("x"),
        F.col("l_quantity").cast("decimal(38,0)").alias("y"),
    )
    per_seg = vals.groupBy("seg").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    per_seg = per_seg.persist()
    pooled = per_seg.agg(
        F.sum("n").cast("decimal(38,0)").alias("pn"),
        F.sum("sx").cast("decimal(38,0)").alias("psx"),
        F.sum("sy").cast("decimal(38,0)").alias("psy"),
        F.sum("sxx").cast("decimal(38,0)").alias("psxx"),
        F.sum("sxy").cast("decimal(38,0)").alias("psxy"),
        F.sum("syy").cast("decimal(38,0)").alias("psyy"),
    )

    def pearson(n, sx, sy, sxx, sxy, syy):
        num = (n * sxy - sx * sy).cast("double")
        den = F.sqrt(
            (n * sxx - sx * sx).cast("double")
            * (n * syy - sy * sy).cast("double")
        )
        return num / den

    r_seg = pearson(
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"),
        F.col("syy"),
    )
    r_all = pearson(
        F.col("pn"), F.col("psx"), F.col("psy"), F.col("psxx"),
        F.col("psxy"), F.col("psyy"),
    )
    return (
        per_seg.transform(scalars(pooled))
        .select(
            "seg",
            F.col("n").cast("bigint").alias("n"),
            round_eps(r_seg, 6).alias("r_segment"),
            round_eps(r_all, 6).alias("r_pooled"),
            F.when((r_seg > 0) != (r_all > 0), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("sign_flip"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------- C142

CTX_LENS = (128, 256, 512, 1024)

_C142_ORACLE = f"""
WITH docs AS (
  SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS toks
  FROM documents
),
grid AS (
  SELECT l.max_len, d.toks
  FROM docs d
  CROSS JOIN (SELECT unnest([{", ".join(map(str, CTX_LENS))}]) AS max_len) l
),
per_len AS (
  SELECT max_len,
         CAST(SUM(toks) AS BIGINT) AS total_toks,
         CAST(SUM((toks + max_len - 1) // max_len) AS BIGINT) AS n_chunks
  FROM grid GROUP BY max_len
)
SELECT CAST(max_len AS BIGINT) AS max_len, total_toks, n_chunks,
       CAST(n_chunks * max_len - total_toks AS BIGINT) AS padding_toks,
       {sql_round('(n_chunks * max_len - total_toks) * 1.0'
                  ' / (n_chunks * max_len)', 6)} AS waste_frac
FROM per_len ORDER BY max_len
"""


@register("context_length_frontier", oracle=_C142_ORACLE)
def context_length_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length capacity frontier: for candidate windows
    128/256/512/1024, the chunk count ⌈tokens/L⌉ per doc (split, not
    packed — the no-cross-doc-attention regime), total padding tokens
    and the waste fraction — the curve that picks max_len BEFORE
    running C49's packer (small windows waste little padding but
    fragment documents; large windows pad short docs; this quantifies
    the trade per corpus). C85's length buckets are the execution
    form; this is the planning form.

    Scale shape: pure map-side — token counts are a projection, the
    4-way candidate explode multiplies rows 4× before ONE
    (max_len)-grain aggregate with exact integer ceil-division. No
    joins, no sort.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("toks")
    )
    grid = docs.select(
        "toks",
        F.explode(
            F.array(*[F.lit(k).cast("bigint") for k in CTX_LENS])
        ).alias("max_len"),
    )
    per_len = grid.groupBy("max_len").agg(
        F.sum("toks").cast("bigint").alias("total_toks"),
        F.sum(
            F.floor(
                (F.col("toks") + F.col("max_len") - 1) / F.col("max_len")
            )
        )
        .cast("bigint")
        .alias("n_chunks"),
    )
    return per_len.select(
        "max_len",
        "total_toks",
        "n_chunks",
        (F.col("n_chunks") * F.col("max_len") - F.col("total_toks"))
        .cast("bigint")
        .alias("padding_toks"),
        round_eps(
            (F.col("n_chunks") * F.col("max_len") - F.col("total_toks"))
            * 1.0
            / (F.col("n_chunks") * F.col("max_len")),
            6,
        ).alias("waste_frac"),
    ).orderBy("max_len")


# ---------------------------------------------------------------- C143

_C143_ORACLE = f"""
WITH norms AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
              v -> v::DOUBLE * v::DOUBLE))) AS nrm,
         embedding
  FROM embeddings
),
unit_dims AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE / nrm AS u
  FROM norms
),
sums AS (
  SELECT dim, SUM(u) AS su, COUNT(*) AS n FROM unit_dims GROUP BY dim
)
SELECT CAST(MAX(n) AS BIGINT) AS n_vecs,
       {sql_round('(SUM(su * su) - MAX(n)) / (MAX(n) * (MAX(n) - 1.0))', 6)}
         AS avg_pairwise_cos,
       {sql_round('SUM(su * su) / (MAX(n) * MAX(n))', 6)}
         AS centroid_sq_norm
FROM sums
"""


@register("isotropy_score", oracle=_C143_ORACLE)
def isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy: the average pairwise cosine over ALL n²
    pairs via the one-pass identity avg_cos = (‖Σu‖² − n)/(n(n−1))
    for unit vectors — no pair join, just the per-dimension sum of
    normalised coordinates (Ethayarajh's anisotropy measure).
    Anisotropic spaces (avg cos ≫ 0) squash cosine contrast and
    degrade every ANN/dedup operator downstream (C8-C15, C25); this
    is the geometry gate run before trusting them, and the number
    that says whether mean-centering is needed.

    Scale shape: one normalisation projection, one posexplode to
    (dim, u) grain, ONE 64-row dimension aggregate — the all-pairs
    statistic without any pair expansion. At 100 TB: identical
    partial sums per batch, merged by addition.
    """
    norms = load_table(spark, sf_dir, "embeddings").select(
        F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda s, v: s + v.cast("double") * v.cast("double"),
            )
        ).alias("nrm"),
        "embedding",
    )
    unit_dims = norms.select(
        F.posexplode("embedding").alias("dim", "v"),
        F.col("nrm"),
    ).select("dim", (F.col("v").cast("double") / F.col("nrm")).alias("u"))
    sums = unit_dims.groupBy("dim").agg(
        F.sum("u").alias("su"), F.count(F.lit(1)).alias("n")
    )
    return sums.agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        round_eps(
            (F.sum(F.col("su") * F.col("su")) - F.max("n"))
            / (F.max("n") * (F.max("n") - 1.0)),
            6,
        ).alias("avg_pairwise_cos"),
        round_eps(
            F.sum(F.col("su") * F.col("su")) / (F.max("n") * F.max("n")), 6
        ).alias("centroid_sq_norm"),
    )
