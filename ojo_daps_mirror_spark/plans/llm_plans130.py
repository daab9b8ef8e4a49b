"""Hundred-thirtieth sweep (SURVEY.md §2 B241-B242, C213).

Max-consensus (exhaustive-RANSAC) robust line fit on the weekly trend
(OLS minimises squared error, Theil-Sen medians the slopes, consensus
MAXIMISES THE INLIER COUNT — the three robust-fit philosophies now sit
side by side on the same series), spectral entropy + Wiener flatness
of the daily-revenue periodogram (one scalar answering 'is this series
rhythmic or noise?' over the WHOLE Fourier grid where B206 checks four
candidate periods), and content-defined chunking (the Rabin/LBFS/rsync
trick: chunk boundaries from the CONTENT hash so insertions don't
shift every downstream chunk — measured chunk-size distribution and
cross-doc chunk dedup rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars, scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B241

RANSAC_TOL_FRAC = 0.05  # inlier band: 5% of the median weekly level

_B241_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
pts AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS t, y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM weekly
),
tol AS (
  SELECT {RANSAC_TOL_FRAC!r} * quantile_cont(y, 0.5) AS tol FROM pts
),
cand AS (
  SELECT a.t AS t1, a.y AS y1, b.t AS t2, b.y AS y2,
         (CAST(b.y AS DOUBLE) - a.y) / (b.t - a.t) AS slope
  FROM pts a JOIN pts b ON b.t = a.t + (a.n // 2)
),
scored AS (
  SELECT c.t1, c.slope,
         CAST(c.y1 AS DOUBLE) - c.slope * c.t1 AS icpt,
         CAST(SUM(CASE WHEN ABS(p.y - (c.y1 + c.slope * (p.t - c.t1)))
                            <= (SELECT tol FROM tol)
                       THEN 1 ELSE 0 END) AS BIGINT) AS inliers,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cand c, pts p
  GROUP BY c.t1, c.slope, c.y1
),
best AS (
  SELECT t1, slope, icpt, inliers, n,
         ROW_NUMBER() OVER (ORDER BY inliers DESC, t1) AS rk
  FROM scored
)
SELECT n AS n_weeks, inliers,
       {sql_round('CAST(inliers AS DOUBLE) * 100.0 / n', 4)}
         AS consensus_pct,
       {sql_round('slope', 6)} AS slope,
       {sql_round('icpt', 4)} AS intercept,
       t1 AS anchor_index
FROM best WHERE rk = 1
"""


@register("max_consensus_line", oracle=_B241_ORACLE)
def max_consensus_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-consensus robust line on weekly order volume — the RANSAC
    objective made deterministic: candidate lines through every
    (t, t + n/2) point pair (the well-separated pairing that keeps
    slope noise down and the candidate count at n/2 instead of n^2),
    each scored by its INLIER COUNT within a tolerance band of 5% of
    the median level, winner = max consensus. Completes the robust
    trio on the same series: OLS (B57) minimises squared loss,
    Theil-Sen (B92) medians pairwise slopes, consensus maximises
    coverage — under heavy contamination the three genuinely
    disagree, and consensus_pct is the contamination gauge.

    Exactness: candidate slopes are exact-integer ratios; the
    tolerance is an exact rank-selected median times a literal;
    inlier counts are integers; winner tiebreak (inliers desc,
    anchor) is total.

    Scale shape: the candidate frame is |weeks|/2 rows broadcast
    against the |weeks| point frame — an O(n^2/2) expression-only
    score over a SERIES-sized (not corpus-sized) frame, then one
    argmax.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                F.datediff(
                    F.date_trunc("week", F.col("o_orderdate")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    pts = weekly.select(
        F.row_number().over(Window.orderBy("w")).cast("bigint").alias("t"),
        "y",
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    pts = pts.persist()
    tol = pts.agg(
        (RANSAC_TOL_FRAC * F.expr("percentile(y, 0.5)")).alias("tol")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    cand = a.join(
        b,
        F.col("b.t") == F.col("a.t") + F.expr("a.n div 2"),
    ).select(
        F.col("a.t").alias("t1"),
        F.col("a.y").alias("y1"),
        (
            (F.col("b.y").cast("double") - F.col("a.y"))
            / (F.col("b.t") - F.col("a.t"))
        ).alias("slope"),
    )
    scored = (
        cand.transform(scalars(tol))
        .crossJoin(pts.select(F.col("t").alias("pt"), F.col("y").alias("py")))
        .select(
            "t1",
            "slope",
            "y1",
            (
                F.abs(
                    F.col("py")
                    - (
                        F.col("y1")
                        + F.col("slope") * (F.col("pt") - F.col("t1"))
                    )
                )
                <= F.col("tol")
            )
            .cast("int")
            .alias("inl"),
        )
        .groupBy("t1", "slope", "y1")
        .agg(
            F.sum("inl").cast("bigint").alias("inliers"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    best = scored.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("inliers").desc(), "t1"))
        .alias("rk"),
    ).where(F.col("rk") == 1)
    return best.select(
        F.col("n").alias("n_weeks"),
        "inliers",
        round_eps(F.col("inliers").cast("double") * 100.0 / F.col("n"), 4)
        .alias("consensus_pct"),
        round_eps(F.col("slope"), 6).alias("slope"),
        round_eps(
            F.col("y1").cast("double") - F.col("slope") * F.col("t1"), 4
        ).alias("intercept"),
        F.col("t1").alias("anchor_index"),
    )


# ---------------------------------------------------------------- B242

SE_HARMONICS = 16

_B242_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
cen AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
         v - (SUM(v) OVER ()) * 1.0 / (COUNT(*) OVER ()) AS e,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
proj AS (
  SELECT j, MAX(n) AS n,
         SUM(e * cos(2 * pi() * j * t / n)) AS cp,
         SUM(e * sin(2 * pi() * j * t / n)) AS sp
  FROM cen, UNNEST(range(1, {SE_HARMONICS} + 1)) AS u(j)
  GROUP BY j
),
powr AS (
  SELECT j, n, cp * cp + sp * sp AS p FROM proj
),
tot AS (
  SELECT MAX(n) AS n, SUM(p) AS sp_, COUNT(*) AS m,
         SUM(ln(p)) AS sln,
         SUM(CASE WHEN p > 0 THEN -(p / (SELECT SUM(p) FROM powr))
                  * ln(p / (SELECT SUM(p) FROM powr)) ELSE 0 END) AS h
  FROM powr
)
SELECT n AS n_days, CAST(m AS BIGINT) AS harmonics,
       {sql_round('h', 6)} AS spectral_entropy,
       {sql_round('h / ln(CAST(m AS DOUBLE))', 6)}
         AS spectral_entropy_norm,
       {sql_round('exp(sln / m) / (sp_ / m)', 6)} AS wiener_flatness
FROM tot
"""


@register("spectral_entropy", oracle=_B242_ORACLE)
def spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy and Wiener (spectral-flatness) measure of
    daily revenue over the first {SE_HARMONICS} Fourier harmonics:
    one scalar for 'rhythmic or noise?' — entropy near ln(m) / flat
    near 1 says white-noise-like power everywhere (forecasting
    beyond the mean is hopeless); low entropy says power concentrates
    in a few lines (seasonality worth modelling). B206's periodogram
    checks four candidate periods; this integrates the whole grid —
    the summary above it.

    Exactness: the centred series is exact rationals times
    trig of exact rational angles (the established periodogram
    recipe — both engines' libm on identical doubles, absorbed at
    6 dp after the projections).

    Scale shape: one fact aggregate to |days|, one |days| x m
    projection aggregate (map-side combinable), one m-row reduction.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    w_all = Window.partitionBy()
    cen = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
        (
            F.col("v")
            - F.sum("v").over(w_all) * 1.0 / F.count(F.lit(1)).over(w_all)
        ).alias("e"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    ang = 2 * F.lit(3.141592653589793) * F.col("j") * F.col("t") / F.col("n")
    proj = (
        cen.select(
            "t",
            "e",
            "n",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, SE_HARMONICS + 1)])
            ).alias("j"),
        )
        .groupBy("j")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("e") * F.cos(ang)).alias("cp"),
            F.sum(F.col("e") * F.sin(ang)).alias("sp"),
        )
    )
    powr = proj.select(
        "j", "n", (F.col("cp") * F.col("cp") + F.col("sp") * F.col("sp"))
        .alias("p")
    )
    tot_p = powr.agg(F.sum("p").alias("tp"))
    tot = attach_scalars(powr, tot_p).agg(
        F.max("n").alias("n"),
        F.sum("p").alias("sp_"),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.log("p")).alias("sln"),
        F.sum(
            F.when(
                F.col("p") > 0,
                -(F.col("p") / F.col("tp"))
                * F.log(F.col("p") / F.col("tp")),
            ).otherwise(0.0)
        ).alias("h"),
    )
    return tot.select(
        F.col("n").alias("n_days"),
        F.col("m").cast("bigint").alias("harmonics"),
        round_eps(F.col("h"), 6).alias("spectral_entropy"),
        round_eps(
            F.col("h") / F.log(F.col("m").cast("double")), 6
        ).alias("spectral_entropy_norm"),
        round_eps(
            F.exp(F.col("sln") / F.col("m")) / (F.col("sp_") / F.col("m")),
            6,
        ).alias("wiener_flatness"),
    )


# ---------------------------------------------------------------- C213

CDC_WIN = 8  # content window
CDC_MOD = 64  # boundary when hash % MOD == 0 -> expected 64-char chunks

_C213_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, p,
         CASE WHEN {sql_hash64("substr(text, p, {W})")} % {CDC_MOD} = 0
              THEN 1 ELSE 0 END AS b
  FROM documents, UNNEST(range(1, length(text) + 1)) AS u(p)
),
numbered AS (
  SELECT doc_id, p,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - b AS chunk_no
  FROM pos
),
chunks AS (
  SELECT d.doc_id, n.chunk_no,
         substr(d.text, CAST(MIN(n.p) AS INT),
                CAST(MAX(n.p) - MIN(n.p) + 1 AS INT)) AS chunk
  FROM numbered n JOIN documents d USING (doc_id)
  GROUP BY d.doc_id, n.chunk_no, d.text
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,
         CAST(COUNT(DISTINCT chunk) AS BIGINT) AS distinct_chunks,
         CAST(SUM(length(chunk)) AS BIGINT) AS total_chars,
         CAST(MAX(length(chunk)) AS BIGINT) AS max_chunk_len,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM chunks
)
SELECT n_docs, total_chunks, distinct_chunks, total_chars,
       max_chunk_len,
       {sql_round('CAST(total_chars AS DOUBLE) / total_chunks', 4)}
         AS mean_chunk_len,
       {sql_round(
           '(1.0 - CAST(distinct_chunks AS DOUBLE) / total_chunks)'
           ' * 100.0', 4)} AS chunk_dup_pct
FROM agg
""".replace("{W}", str(CDC_WIN))


@register("cdc_chunking", oracle=_C213_ORACLE)
def cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS/rsync trick): a
    chunk boundary opens wherever the hash of the {CDC_WIN}-char
    content window divides {CDC_MOD} — so boundaries move WITH the
    content and a one-character insertion re-chunks only its
    neighbourhood, where fixed-size chunking shifts every downstream
    chunk (chunk_dedup_rate's failure mode). Reports the realised
    chunk-size distribution against the designed {CDC_MOD}-char
    expectation and the cross-document duplicate-chunk rate — the
    dedup win CDC exists to harvest.

    Exactness: boundaries, chunk extents and all counts are exact
    integers from the shared md5 hash64; two divisions at the end.

    Scale shape: per-char boundary flags are map-side; the chunk
    assembly is one per-doc prefix-sum window + one (doc, chunk_no)
    aggregate; the dedup count is one distinct over chunks — at
    100 TB chunks shuffle by content hash exactly like the shingle
    pipelines.
    """
    # Boundary positions as a map-side array (unigram_entropy's
    # boundary-positions shape): the previous form exploded one row
    # PER CHARACTER carrying the full text column into a per-doc
    # prefix-sum window — O(len · |text|) shuffle bytes per document
    # (4.1 s min-of-3 at sf0.1) — when a boundary at p just means
    # "position p ends a chunk": chunk starts are 1 plus every
    # boundary+1, ends are the next start − 1 (len for the last), and
    # both fall out of one filtered sequence with NO explode, window
    # or shuffle before chunk grain. Identical integer extents →
    # identical substrings. explode_outer, not explode: a bare
    # explode's inferred non-empty filter re-inlines the whole md5
    # pipeline below the projections (the winnowing_fingerprints
    # lesson this round).
    from ..functions.text import spark_sql_hash64

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bs_sql = (
        f"filter(sequence(1, length(text)),"
        f" p -> ({spark_sql_hash64(f'substring(text, p, {CDC_WIN})')})"
        f" % {CDC_MOD} = 0)"
    )
    base = docs.select(
        "doc_id",
        "text",
        F.expr(
            f"CASE WHEN length(text) >= 1 THEN {bs_sql}"
            " ELSE cast(array() as array<int>) END"
        ).alias("bs"),
    )
    sted = base.select(
        "doc_id",
        "text",
        F.expr(
            "concat(array(1),"
            " transform(filter(bs, p -> p < length(text)), p -> p + 1))"
        ).alias("starts"),
    )
    chunks = sted.select(
        "doc_id",
        F.explode_outer(
            F.expr(
                "CASE WHEN length(text) >= 1 THEN"
                " zip_with(starts,"
                "  concat(transform(slice(starts, 2, size(starts)),"
                "                   s -> s - 1),"
                "         array(length(text))),"
                "  (s, e) -> substring(text, s, e - s + 1))"
                " ELSE cast(array() as array<string>) END"
            )
        ).alias("chunk"),
    ).where(F.col("chunk").isNotNull())
    agg = chunks.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_chunks"),
        F.countDistinct("chunk").cast("bigint").alias("distinct_chunks"),
        F.sum(F.length("chunk")).cast("bigint").alias("total_chars"),
        F.max(F.length("chunk")).cast("bigint").alias("max_chunk_len"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return agg.select(
        "n_docs",
        "total_chunks",
        "distinct_chunks",
        "total_chars",
        "max_chunk_len",
        round_eps(
            F.col("total_chars").cast("double") / F.col("total_chunks"), 4
        ).alias("mean_chunk_len"),
        round_eps(
            (
                1.0
                - F.col("distinct_chunks").cast("double")
                / F.col("total_chunks")
            )
            * 100.0,
            4,
        ).alias("chunk_dup_pct"),
    )
