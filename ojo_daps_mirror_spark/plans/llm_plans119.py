"""Hundred-nineteenth sweep (SURVEY.md §2 B224-B225, C197).

Granger causality between two segments' weekly volumes (does one book
predict the other — the lead-lag INFERENCE over B56's contemporaneous
correlations), the signed cross-correlation function at lags -4..+4
(the descriptive picture Granger's single F compresses), and the
quality-filter Venn (the 8-cell overlap of three document gates — the
table that says which filters are redundant and which unique docs
each one alone would save or kill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_sf_abs, sql_normal_sf_abs
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B224

GC_SEG_A = "BUILDING"
GC_SEG_B = "MACHINERY"


def _gc_pair_sql(yseg: str, xseg: str, direction: str) -> str:
    """One direction of the test: does x's past improve y's AR(1)?"""
    return f"""
  SELECT '{direction}' AS direction,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y1) AS BIGINT) AS sa,
         CAST(SUM(x1) AS BIGINT) AS sb,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         CAST(SUM(CAST(y AS HUGEINT) * y1) AS DOUBLE) AS sya,
         CAST(SUM(CAST(y AS HUGEINT) * x1) AS DOUBLE) AS syb,
         CAST(SUM(CAST(y1 AS HUGEINT) * y1) AS DOUBLE) AS saa,
         CAST(SUM(CAST(y1 AS HUGEINT) * x1) AS DOUBLE) AS sab,
         CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS sbb
  FROM (
    SELECT t.w, {yseg}.y AS y, {yseg}1.y AS y1, {xseg}1.y AS x1
    FROM grid t
    JOIN series {yseg} ON {yseg}.seg = '{{{yseg}}}' AND {yseg}.w = t.w
    JOIN series {yseg}1 ON {yseg}1.seg = '{{{yseg}}}' AND {yseg}1.w = t.w - 1
    JOIN series {xseg}1 ON {xseg}1.seg = '{{{xseg}}}' AND {xseg}1.w = t.w - 1
  )"""


_B224_ORACLE = (
    f"""
WITH series AS (
  SELECT c.c_mktsegment AS seg,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{GC_SEG_A}', '{GC_SEG_B}')
  GROUP BY 1, 2
),
grid AS (SELECT DISTINCT w FROM series),
sums AS (
"""
    + _gc_pair_sql("a", "b", "x_to_y")
    + """
  UNION ALL
"""
    + _gc_pair_sql("b", "a", "y_to_x")
    + f"""
),
centered AS (
  SELECT direction, n,
         n * syy - CAST(sy AS DOUBLE) * sy AS cyy,
         n * sya - CAST(sy AS DOUBLE) * sa AS cya,
         n * syb - CAST(sy AS DOUBLE) * sb AS cyb,
         n * saa - CAST(sa AS DOUBLE) * sa AS caa,
         n * sab - CAST(sa AS DOUBLE) * sb AS cab,
         n * sbb - CAST(sb AS DOUBLE) * sb AS cbb
  FROM sums
),
fits AS (
  SELECT direction, n,
         cyy - cya * cya / caa AS sse_r,
         cyy - ((cya * cbb - cyb * cab) * cya
                + (cyb * caa - cya * cab) * cyb)
               / (caa * cbb - cab * cab) AS sse_u
  FROM centered
),
tested AS (
  SELECT direction, n,
         (sse_r - sse_u) / (sse_u / (n - 3.0)) AS f_stat
  FROM fits
)
SELECT direction, n AS n_weeks,
       {sql_round('f_stat', 4)} AS f_stat,
       {sql_round('2.0 * ' + sql_normal_sf_abs('sqrt(f_stat)'), 6)}
         AS p_value_asymp,
       CASE WHEN f_stat > 3.841 THEN 1 ELSE 0 END AS significant_5pct
FROM tested ORDER BY direction
"""
)
_B224_ORACLE = _B224_ORACLE.replace("{a}", GC_SEG_A).replace("{b}", GC_SEG_B)


@register("granger_causality", oracle=_B224_ORACLE)
def granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger causality in BOTH directions between the
    {GC_SEG_A} and {GC_SEG_B} segments' weekly order counts: F-test
    of adding x_(t-1) to y's AR(1) — did last week in one book carry
    information about this week in the other, over and above the
    other book's own history? B56's correlation matrix is
    contemporaneous and symmetric; Granger is lagged and DIRECTED,
    and an asymmetric pair (x drives y but not back) is an actual
    operational lead indicator. F's 1-df numerator makes
    p = 2(1-Phi(sqrt(F))) the exact chi2(1) asymptotic.

    Exactness: all nine cross-moment sums over the aligned weeks are
    exact 128-bit integers; both SSEs come from the same
    Cramer-closed-form on n-scaled centered moments (B136's
    machinery, two regressors), identical double trees.

    Scale shape: one fact collapse to the (segment, week) frame;
    alignment is self-joins at week grain; the regression consumes
    one sufficient-statistic row per direction.
    """
    series = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d")
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ),
            "ck",
        )
        .where(F.col("seg").isin(GC_SEG_A, GC_SEG_B))
        .groupBy(
            "seg",
            (
                F.datediff(
                    F.date_trunc("week", F.col("d")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    series = series.persist()

    def one_direction(yseg: str, xseg: str, tag: str) -> DataFrame:
        ys = series.where(F.col("seg") == yseg).select("w", "y")
        ys1 = series.where(F.col("seg") == yseg).select(
            (F.col("w") + 1).alias("w"), F.col("y").alias("y1")
        )
        xs1 = series.where(F.col("seg") == xseg).select(
            (F.col("w") + 1).alias("w"), F.col("y").alias("x1")
        )
        dec = "decimal(38,0)"
        joined = ys.join(ys1, "w").join(xs1, "w")
        return joined.agg(
            F.lit(tag).alias("direction"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum("y1").cast("bigint").alias("sa"),
            F.sum("x1").cast("bigint").alias("sb"),
            F.sum(F.col("y").cast(dec) * F.col("y")).cast("double").alias("syy"),
            F.sum(F.col("y").cast(dec) * F.col("y1")).cast("double").alias("sya"),
            F.sum(F.col("y").cast(dec) * F.col("x1")).cast("double").alias("syb"),
            F.sum(F.col("y1").cast(dec) * F.col("y1")).cast("double").alias("saa"),
            F.sum(F.col("y1").cast(dec) * F.col("x1")).cast("double").alias("sab"),
            F.sum(F.col("x1").cast(dec) * F.col("x1")).cast("double").alias("sbb"),
        )

    sums = one_direction(GC_SEG_A, GC_SEG_B, "x_to_y").unionByName(
        one_direction(GC_SEG_B, GC_SEG_A, "y_to_x")
    )
    nd = F.col("n").cast("double")
    cyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    cya = nd * F.col("sya") - F.col("sy").cast("double") * F.col("sa")
    cyb = nd * F.col("syb") - F.col("sy").cast("double") * F.col("sb")
    caa = nd * F.col("saa") - F.col("sa").cast("double") * F.col("sa")
    cab = nd * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    cbb = nd * F.col("sbb") - F.col("sb").cast("double") * F.col("sb")
    sse_r = cyy - cya * cya / caa
    sse_u = cyy - (
        (cya * cbb - cyb * cab) * cya + (cyb * caa - cya * cab) * cyb
    ) / (caa * cbb - cab * cab)
    f_stat = (sse_r - sse_u) / (sse_u / (nd - 3.0))
    tested = sums.withColumn("f_stat", f_stat)
    return tested.select(
        "direction",
        F.col("n").alias("n_weeks"),
        round_eps(F.col("f_stat"), 4).alias("f_stat"),
        round_eps(
            2.0 * normal_sf_abs(F.sqrt(F.col("f_stat"))), 6
        ).alias("p_value_asymp"),
        (F.col("f_stat") > 3.841).cast("int").alias("significant_5pct"),
    ).orderBy("direction")


# ---------------------------------------------------------------- B225

CCF_MAX_LAG = 4

_B225_ORACLE = f"""
WITH series AS (
  SELECT c.c_mktsegment AS seg,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{GC_SEG_A}', '{GC_SEG_B}')
  GROUP BY 1, 2
),
lags AS (
  SELECT unnest(generate_series(-{CCF_MAX_LAG}, {CCF_MAX_LAG})) AS k
),
pairs AS (
  SELECT l.k, a.y AS x, b.y AS yv
  FROM lags l
  JOIN series a ON a.seg = '{GC_SEG_A}'
  JOIN series b ON b.seg = '{GC_SEG_B}' AND b.w = a.w + l.k
),
sums AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(yv) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * yv) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(yv AS HUGEINT) * yv) AS DOUBLE) AS syy
  FROM pairs GROUP BY k
),
corr AS (
  SELECT k, n,
         (n * sxy - CAST(sx AS DOUBLE) * sy)
           / sqrt((n * sxx - CAST(sx AS DOUBLE) * sx)
                  * (n * syy - CAST(sy AS DOUBLE) * sy)) AS r
  FROM sums
)
SELECT CAST(k AS BIGINT) AS lag_weeks, n AS n_pairs,
       {sql_round('r', 6)} AS ccf,
       {sql_round('r * sqrt(n)', 4)} AS z_score
FROM corr ORDER BY lag_weeks
"""


@register("cross_correlation_leadlag", oracle=_B225_ORACLE)
def cross_correlation_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between {GC_SEG_A} (x) and
    {GC_SEG_B} (y) weekly order counts at lags -{CCF_MAX_LAG} to
    +{CCF_MAX_LAG}: ccf at lag k correlates x_t with y_(t+k), so a
    peak at POSITIVE k means x leads y by k weeks. The whole signed
    picture B224's single F-statistic compresses — an off-centre
    asymmetric ridge is a genuine lead indicator, a symmetric peak
    at 0 is a common driver (seasonality both books share), and
    which is which decides whether cross-book forecasting can work.

    Exactness: per-lag counts and all five cross-moment sums are
    exact 128-bit integers over the aligned week pairs; r is one
    identical double tree per lag.

    Scale shape: one fact collapse to the (segment, week) frame;
    the 9 lags explode from a literal array and align via ONE join
    at week grain; nothing after the first aggregate sees volume.
    """
    series = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d")
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ),
            "ck",
        )
        .where(F.col("seg").isin(GC_SEG_A, GC_SEG_B))
        .groupBy(
            "seg",
            (
                F.datediff(
                    F.date_trunc("week", F.col("d")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    series = series.persist()
    xs = series.where(F.col("seg") == GC_SEG_A).select(
        "w", F.col("y").alias("x")
    )
    ys = series.where(F.col("seg") == GC_SEG_B).select(
        F.col("w").alias("wy"), F.col("y").alias("yv")
    )
    lagged = xs.select(
        "w",
        "x",
        F.explode(
            F.array(
                *[F.lit(k) for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1)]
            )
        ).alias("k"),
    ).withColumn("wy", F.col("w") + F.col("k"))
    pairs = lagged.join(ys, "wy")
    dec = "decimal(38,0)"
    sums = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("yv").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("yv")).cast("double").alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("yv").cast(dec) * F.col("yv")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    corr = sums.withColumn("r", r)
    return corr.select(
        F.col("k").cast("bigint").alias("lag_weeks"),
        F.col("n").alias("n_pairs"),
        round_eps(F.col("r"), 6).alias("ccf"),
        round_eps(F.col("r") * F.sqrt(nd), 4).alias("z_score"),
    ).orderBy("lag_weeks")


# ---------------------------------------------------------------- C197

FV_LEN_MIN = 25  # short-doc gate: n_tokens < this fails
FV_REP_MAX = 0.12  # repetition gate: top-token share > this fails
FV_TTR_MIN = 0.40  # diversity gate: type/token ratio < this fails

_C197_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
per_tok AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS d,
         CAST(MAX(c) AS BIGINT) AS cmax
  FROM per_tok GROUP BY doc_id
),
flagged AS (
  SELECT doc_id, n,
         CASE WHEN n < {FV_LEN_MIN} THEN 1 ELSE 0 END AS f_short,
         CASE WHEN cmax * 1.0 / n > {FV_REP_MAX} THEN 1 ELSE 0 END
           AS f_repeat,
         CASE WHEN d * 1.0 / n < {FV_TTR_MIN} THEN 1 ELSE 0 END
           AS f_lowdiv
  FROM per_doc
),
cells AS (
  SELECT f_short, f_repeat, f_lowdiv,
         CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(n) AS BIGINT) AS tokens
  FROM flagged GROUP BY 1, 2, 3
),
tot AS (
  SELECT CAST(SUM(docs) AS BIGINT) AS td, CAST(SUM(tokens) AS BIGINT) AS tt
  FROM cells
)
SELECT f_short, f_repeat, f_lowdiv, docs, tokens,
       {sql_round('docs * 100.0 / td', 4)} AS doc_pct,
       {sql_round('tokens * 100.0 / tt', 4)} AS token_pct
FROM cells CROSS JOIN tot
ORDER BY f_short, f_repeat, f_lowdiv
"""


@register("filter_venn_overlap", oracle=_C197_ORACLE)
def filter_venn_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter Venn: every document is flagged by three
    independent gates (too short < {FV_LEN_MIN} tokens; repetitive —
    top-token share > {FV_REP_MAX}; low-diversity — type/token ratio
    < {FV_TTR_MIN}), and the 8-cell table reports docs and token
    mass per flag combination. This is the table that decides filter
    ECONOMICS: a gate whose kills are a subset of another's (its
    exclusive cell ~ 0) is compute spent on nothing, while a gate
    with a fat exclusive cell is the only thing standing between
    that mass and the training set. C2/C17 score docs; this audits
    the GATES against each other.

    Exactness: all three flags derive from exact integer per-doc
    counts and literal thresholds; cells are exact counts with two
    ratio columns.

    Scale shape: one (doc, token) aggregate (the same shuffle grain
    every token statistic here rides), one doc-grain reduction, one
    8-row cell aggregate with a 1-row total attach.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.max("c").cast("bigint").alias("cmax"),
    )
    flagged = per_doc.select(
        "doc_id",
        "n",
        (F.col("n") < FV_LEN_MIN).cast("int").alias("f_short"),
        (F.col("cmax") * 1.0 / F.col("n") > FV_REP_MAX)
        .cast("int")
        .alias("f_repeat"),
        (F.col("d") * 1.0 / F.col("n") < FV_TTR_MIN)
        .cast("int")
        .alias("f_lowdiv"),
    )
    cells = flagged.groupBy("f_short", "f_repeat", "f_lowdiv").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum("n").cast("bigint").alias("tokens"),
    )
    tot = cells.agg(
        F.sum("docs").cast("bigint").alias("td"),
        F.sum("tokens").cast("bigint").alias("tt"),
    )
    return (
        attach_scalars(cells, tot)
        .select(
            "f_short",
            "f_repeat",
            "f_lowdiv",
            "docs",
            "tokens",
            round_eps(F.col("docs") * 100.0 / F.col("td"), 4).alias(
                "doc_pct"
            ),
            round_eps(F.col("tokens") * 100.0 / F.col("tt"), 4).alias(
                "token_pct"
            ),
        )
        .orderBy("f_short", "f_repeat", "f_lowdiv")
    )
