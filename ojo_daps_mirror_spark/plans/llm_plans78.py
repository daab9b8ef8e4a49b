"""Seventy-eighth sweep (SURVEY.md §2 B142-B143, C153).

Spearman's rank correlation (the monotone-association twin of B141's
Kendall tau, measured on the IDENTICAL contingency grid so the two
statistics are directly comparable), the Jarque-Bera normality test
(the moment-based gate every "assume Gaussian" downstream model
should read first), and winnowing fingerprint overlap (Schleimer-
Wilkerson-Aiken 2003, the MOSS local fingerprinting scheme — the
position-robust dedup primitive C4's single rolling hash and C5's
whole-doc MinHash both miss: it finds docs sharing CONTIGUOUS
regions, guaranteed to fingerprint any match of w+k-1 tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64, sql_tokens, tokens
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B142

_B142_ORACLE = f"""
WITH joined AS (
  SELECT p.p_size AS x, CAST(ROUND(l.l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_cell
  FROM joined GROUP BY x, y
),
tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n FROM cells),
mx AS (
  SELECT x, CAST(SUM(n_cell) AS BIGINT) AS cnt FROM cells GROUP BY x
),
my AS (
  SELECT y, CAST(SUM(n_cell) AS BIGINT) AS cnt FROM cells GROUP BY y
),
rx AS (
  SELECT x,
         CAST(2 * SUM(cnt) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS BIGINT) AS rank2
  FROM mx
),
ry AS (
  SELECT y,
         CAST(2 * SUM(cnt) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS BIGINT) AS rank2
  FROM my
),
centered AS (
  SELECT c.n_cell,
         rx.rank2 - (t.n + 1) AS cx,
         ry.rank2 - (t.n + 1) AS cy,
         t.n
  FROM cells c
  JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN tot t
),
suff AS (
  SELECT MAX(n) AS n,
         CAST(SUM(n_cell * cx * cy) AS BIGINT) AS sxy,
         CAST(SUM(n_cell * cx * cx) AS BIGINT) AS sxx,
         CAST(SUM(n_cell * cy * cy) AS BIGINT) AS syy
  FROM centered
)
SELECT n,
       {sql_round('(sxy * 1.0) / (sqrt(sxx * 1.0) * sqrt(syy * 1.0))', 6)}
         AS rho_spearman,
       {sql_round(
           '((sxy * 1.0) / (sqrt(sxx * 1.0) * sqrt(syy * 1.0)))'
           ' * sqrt((n - 2)'
           ' / (1.0 - ((sxy * 1.0) / (sqrt(sxx * 1.0) * sqrt(syy * 1.0)))'
           '   * ((sxy * 1.0) / (sqrt(sxx * 1.0) * sqrt(syy * 1.0)))))',
           6)} AS t_stat
FROM suff
"""


@register("spearman_rho", oracle=_B142_ORACLE)
def spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between part size and
    line quantity — the monotone-association measure on the SAME
    (x, y) contingency grid as B141's Kendall tau-b, so the pair
    reads like the textbook comparison (rho weights by rank
    displacement, tau by pair inversions).

    Exactness: average ranks via B91's doubled-rank trick stay
    integers; the centered doubled rank (rank2 - (n+1)) is still an
    integer because E[rank2] = n+1 exactly, so all three sufficient
    statistics (Sxy, Sxx, Syy) are exact BIGINTs — rho is ONE double
    division of exact integers, no catastrophic cancellation (the
    naive Sxy - SxSy/n form cancels ~10 significant digits).

    Scale shape: fact join collapses to the bounded (p_size x qty)
    grid (<=2,500 cells) in one map-side-combined aggregate; marginal
    ranks are ordered windows over <=50-row frames; n attaches via a
    window over the grid, never a fact-side shuffle.

    Reference analog: the rank-correlation companion to the salary /
    vacancy trend statistics in dqa/data_getters.py (which the
    reference eyeballs from pandas .corr(method='spearman')).
    """
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_size").alias("x")
    )
    joined = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.round(F.col("l_quantity")).cast("bigint").alias("y"),
        )
        .join(F.broadcast(part), "pk")
    )
    cells = joined.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cell")
    )
    cells = cells.persist()
    w_all = Window.partitionBy()
    w_x = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_y = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rx = (
        cells.groupBy("x")
        .agg(F.sum("n_cell").cast("bigint").alias("cnt"))
        .select(
            "x",
            (2 * F.sum("cnt").over(w_x) - F.col("cnt") + 1)
            .cast("bigint")
            .alias("rank2_x"),
        )
    )
    ry = (
        cells.groupBy("y")
        .agg(F.sum("n_cell").cast("bigint").alias("cnt"))
        .select(
            "y",
            (2 * F.sum("cnt").over(w_y) - F.col("cnt") + 1)
            .cast("bigint")
            .alias("rank2_y"),
        )
    )
    centered = (
        cells.withColumn(
            "n", F.sum("n_cell").over(w_all).cast("bigint")
        )
        .join(F.broadcast(rx), "x")
        .join(F.broadcast(ry), "y")
        .select(
            "n",
            "n_cell",
            (F.col("rank2_x") - (F.col("n") + 1)).alias("cx"),
            (F.col("rank2_y") - (F.col("n") + 1)).alias("cy"),
        )
    )
    suff = centered.agg(
        F.max("n").alias("n"),
        F.sum(F.col("n_cell") * F.col("cx") * F.col("cy"))
        .cast("bigint")
        .alias("sxy"),
        F.sum(F.col("n_cell") * F.col("cx") * F.col("cx"))
        .cast("bigint")
        .alias("sxx"),
        F.sum(F.col("n_cell") * F.col("cy") * F.col("cy"))
        .cast("bigint")
        .alias("syy"),
    )
    rho = (F.col("sxy") * 1.0) / (
        F.sqrt(F.col("sxx") * 1.0) * F.sqrt(F.col("syy") * 1.0)
    )
    return suff.select(
        "n",
        round_eps(rho, 6).alias("rho_spearman"),
        round_eps(
            rho * F.sqrt((F.col("n") - 2) / (1.0 - rho * rho)), 6
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------- B143

_B143_ORACLE = f"""
WITH samp AS (
  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity) AS BIGINT) AS q
  FROM lineitem
),
sums AS (
  SELECT flag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2,
         CAST(SUM(q * q * q) AS BIGINT) AS s3,
         CAST(SUM(q * q * q * q) AS BIGINT) AS s4
  FROM samp GROUP BY flag
),
moments AS (
  SELECT flag, n,
         (s1 * 1.0) / n AS mu,
         (s2 * 1.0) / n - ((s1 * 1.0) / n) * ((s1 * 1.0) / n) AS m2,
         (s3 * 1.0) / n
           - 3.0 * ((s1 * 1.0) / n) * ((s2 * 1.0) / n)
           + 2.0 * ((s1 * 1.0) / n) * ((s1 * 1.0) / n) * ((s1 * 1.0) / n)
           AS m3,
         (s4 * 1.0) / n
           - 4.0 * ((s1 * 1.0) / n) * ((s3 * 1.0) / n)
           + 6.0 * ((s1 * 1.0) / n) * ((s1 * 1.0) / n) * ((s2 * 1.0) / n)
           - 3.0 * ((s1 * 1.0) / n) * ((s1 * 1.0) / n)
             * ((s1 * 1.0) / n) * ((s1 * 1.0) / n)
           AS m4
  FROM sums
),
stats AS (
  SELECT flag, n, mu,
         m3 / (m2 * sqrt(m2)) AS skew,
         m4 / (m2 * m2) - 3.0 AS kurt_ex
  FROM moments
)
SELECT flag, n,
       {sql_round('mu', 6)} AS mean_qty,
       {sql_round('skew', 6)} AS skewness,
       {sql_round('kurt_ex', 6)} AS kurtosis_excess,
       {sql_round(
           '(n / 6.0) * (skew * skew + (kurt_ex * kurt_ex) / 4.0)', 6)}
         AS jb_stat
FROM stats ORDER BY flag
"""


@register("jarque_bera", oracle=_B143_ORACLE)
def jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of line quantity per return flag —
    the skewness/kurtosis moment gate that tells a modeler whether
    Gaussian assumptions (B57's OLS residuals, B110's z-score
    anomaly flags) are even admissible; chi2(2) under H0.

    Exactness: raw power sums S1..S4 are exact BIGINTs (quantity is
    a small integer, so S4 <= n * 50^4 stays far inside 2^63 even at
    sf1000); central moments, skewness, excess kurtosis and JB are
    O(1) double algebra written with the IDENTICAL expression shape
    in both engines so IEEE evaluation cannot diverge.

    Scale shape: one map-side-combined aggregate to |flags| rows —
    the normality test at 100 TB costs exactly one scan.
    """
    q = F.round(F.col("l_quantity")).cast("bigint")
    sums = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("flag"), q.alias("q"))
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s1"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
            F.sum(F.col("q") * F.col("q") * F.col("q"))
            .cast("bigint")
            .alias("s3"),
            F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q"))
            .cast("bigint")
            .alias("s4"),
        )
    )
    n = F.col("n")
    r1 = (F.col("s1") * 1.0) / n
    r2 = (F.col("s2") * 1.0) / n
    r3 = (F.col("s3") * 1.0) / n
    r4 = (F.col("s4") * 1.0) / n
    moments = sums.select(
        "flag",
        "n",
        r1.alias("mu"),
        (r2 - r1 * r1).alias("m2"),
        (r3 - 3.0 * r1 * r2 + 2.0 * r1 * r1 * r1).alias("m3"),
        (
            r4
            - 4.0 * r1 * r3
            + 6.0 * r1 * r1 * r2
            - 3.0 * r1 * r1 * r1 * r1
        ).alias("m4"),
    )
    m2 = F.col("m2")
    stats = moments.select(
        "flag",
        "n",
        "mu",
        (F.col("m3") / (m2 * F.sqrt(m2))).alias("skew"),
        (F.col("m4") / (m2 * m2) - 3.0).alias("kurt_ex"),
    )
    skew, kurt = F.col("skew"), F.col("kurt_ex")
    return stats.select(
        "flag",
        "n",
        round_eps(F.col("mu"), 6).alias("mean_qty"),
        round_eps(skew, 6).alias("skewness"),
        round_eps(kurt, 6).alias("kurtosis_excess"),
        round_eps(
            (n / 6.0) * (skew * skew + (kurt * kurt) / 4.0), 6
        ).alias("jb_stat"),
    ).orderBy("flag")


# ---------------------------------------------------------------- C153

WIN_K = 3  # k-gram size (word shingles)
WIN_W = 4  # winnowing window: any match of WIN_W+WIN_K-1 tokens is caught
WIN_DF_CAP = 64  # hot-fingerprint guard (boilerplate buckets dropped)
WIN_MIN_SHARED = 2  # pair survives with >= this many shared fingerprints

_T = sql_tokens("lower(text)")
_C153_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len({_T}) - {WIN_K - 1}, 0)),
           i -> {" || ' ' || ".join(f"({_T})[i+{o}]" for o in range(WIN_K))}
         ) AS g
  FROM documents
),
hashes AS (
  SELECT doc_id, list_transform(g, s -> {sql_hash64('s')}) AS h
  FROM grams
),
fps AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(h) - {WIN_W - 1}),
           j -> list_min(h[j:j+{WIN_W - 1}]))) AS f
  FROM hashes
),
doc_fp AS (SELECT doc_id, unnest(f) AS fp FROM fps),
hot AS (
  SELECT fp FROM doc_fp GROUP BY fp
  HAVING COUNT(*) BETWEEN 2 AND {WIN_DF_CAP}
),
e AS (SELECT doc_id, fp FROM doc_fp JOIN hot USING (fp))
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {WIN_MIN_SHARED}
ORDER BY d1, d2
"""


@register("winnowing_fingerprints", oracle=_C153_ORACLE)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap (Schleimer-Wilkerson-Aiken 2003,
    the MOSS algorithm): per doc, hash every positional word
    {WIN_K}-gram, slide a {WIN_W}-window over the hash stream keeping
    each window's minimum, and report doc pairs sharing >=
    {WIN_MIN_SHARED} selected fingerprints. The guarantee C4's single
    rolling hash and C5's whole-doc MinHash both lack: ANY shared
    contiguous run of w+k-1 tokens is certain to contribute a common
    fingerprint, so copied passages inside otherwise-different docs
    are found — the plagiarism / boilerplate-span detector.

    Scale shape: gram hashing and window minima are pure map-side
    array expressions (the hash stream is materialised as a concrete
    column first, so the windowed `slice` reads a bound attribute
    instead of re-evaluating the gram pipeline per window — the
    O(len^2) trap functions/text.py documents). One explode at
    (doc, fingerprint) grain — sparser than token grain by ~w —
    then a df-capped equi self-join exactly like C7: fingerprints
    seen in > {WIN_DF_CAP} docs are template noise and dropped
    (logged shape, same guard as NG_DF_CAP), so no hot bucket can
    expand quadratically.

    Reference analog: labs/deduplication's passage-level near-dup
    intent (flows/enrich/deduplication.py), done with local
    fingerprints instead of whole-doc signatures.
    """
    toks = tokens(F.lower(F.col("text")))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("t")
    )
    t = F.col("t")
    cur = t
    for off in range(1, WIN_K):
        shifted = F.slice(
            t, off + 1, F.greatest(F.size(t) - off, F.lit(0))
        )
        cur = F.zip_with(cur, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.slice(
        cur, 1, F.greatest(F.size(t) - (WIN_K - 1), F.lit(0))
    )
    hashes = docs.select(
        "doc_id", F.transform(grams, hash64).alias("h")
    )
    nwin = F.size(F.col("h")) - (WIN_W - 1)
    fps = hashes.select(
        "doc_id",
        F.when(
            nwin >= 1,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(h) - {WIN_W - 1}),"
                    f" j -> array_min(slice(h, j, {WIN_W})))"
                )
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("f"),
    )
    # r7 fifth resume: a capped posting-list rewrite (containment_dedup's
    # collect_list + map-side pair expansion, replacing hot/e and the
    # two-sided self-join below) was oracle-green but measured SLOWER in
    # interleaved min-of-3 A/Bs (1.78/1.57 -> 2.22/3.77 s at sf0.1): the
    # ObjectHashAggregate collect_list + interpreted pair HOF loses to
    # these whole-stage-codegen narrow-row joins. Reverted. NOTE the
    # persist below is ALSO a correctness-of-cost barrier: without it, a
    # bare explode's inferred `size(f) > 0` filter is pushed below the
    # projections and re-inlines the whole gram->md5->window-min pipeline
    # per filter evaluation (measured 119 s; explode_outer + an
    # isNotNull on the GENERATED column is the fix if the persist ever
    # goes away).
    doc_fp = fps.select("doc_id", F.explode("f").alias("fp"))
    doc_fp = doc_fp.persist()
    hot = (
        doc_fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= WIN_DF_CAP))
        .select("fp")
    )
    e = doc_fp.join(hot, "fp")
    a = e.select(F.col("fp"), F.col("doc_id").alias("d1"))
    b = e.select(F.col("fp"), F.col("doc_id").alias("d2"))
    return (
        a.join(b, "fp")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= WIN_MIN_SHARED)
        .orderBy("d1", "d2")
    )
