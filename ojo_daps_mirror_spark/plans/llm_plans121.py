"""Hundred-twenty-first sweep (SURVEY.md §2 B228-B229, C199).

Grid-searched two-segment trend break with the Chow F (Pettitt finds
a MEAN shift; this finds a SLOPE change, with every candidate break
priced in O(1) off prefix sums — the scale story is the point),
Tukey's one-degree-of-freedom nonadditivity test on the segment x
priority grid (is the additive row+column story B-track margins tell
actually sufficient, or do cells interact), and the split-half
reliability of per-source corpus metrics (Spearman-Brown: is a
source-level number a measurement or noise — the meta-audit under
every per-source table in the C-track).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B228

_B228_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
indexed AS (
  SELECT w, y, CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS t,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM weekly
),
prefix AS (
  SELECT w, t, n,
         CAST(SUM(t) OVER (ORDER BY t) AS BIGINT) AS pt,
         CAST(SUM(y) OVER (ORDER BY t) AS BIGINT) AS py,
         CAST(SUM(CAST(t AS HUGEINT) * t) OVER (ORDER BY t)
              AS DOUBLE) AS ptt,
         CAST(SUM(CAST(t AS HUGEINT) * y) OVER (ORDER BY t)
              AS DOUBLE) AS pty,
         CAST(SUM(CAST(y AS HUGEINT) * y) OVER (ORDER BY t)
              AS DOUBLE) AS pyy,
         CAST(SUM(t) OVER () AS BIGINT) AS gt,
         CAST(SUM(y) OVER () AS BIGINT) AS gy,
         CAST(SUM(CAST(t AS HUGEINT) * t) OVER () AS DOUBLE) AS gtt,
         CAST(SUM(CAST(t AS HUGEINT) * y) OVER () AS DOUBLE) AS gty,
         CAST(SUM(CAST(y AS HUGEINT) * y) OVER () AS DOUBLE) AS gyy
  FROM indexed
),
cand AS (
  SELECT w, t, n,
         ((t * pyy - CAST(py AS DOUBLE) * py)
          - (t * pty - CAST(pt AS DOUBLE) * py)
            * (t * pty - CAST(pt AS DOUBLE) * py)
            / (t * ptt - CAST(pt AS DOUBLE) * pt)) / t AS sse_l,
         (((n - t) * (gyy - pyy)
           - CAST(gy - py AS DOUBLE) * (gy - py))
          - ((n - t) * (gty - pty)
             - CAST(gt - pt AS DOUBLE) * (gy - py))
            * ((n - t) * (gty - pty)
               - CAST(gt - pt AS DOUBLE) * (gy - py))
            / ((n - t) * (gtt - ptt)
               - CAST(gt - pt AS DOUBLE) * (gt - pt))) / (n - t) AS sse_r,
         (t * pty - CAST(pt AS DOUBLE) * py)
           / (t * ptt - CAST(pt AS DOUBLE) * pt) AS slope_l,
         ((n - t) * (gty - pty) - CAST(gt - pt AS DOUBLE) * (gy - py))
           / ((n - t) * (gtt - ptt)
              - CAST(gt - pt AS DOUBLE) * (gt - pt)) AS slope_r,
         ((n * gyy - CAST(gy AS DOUBLE) * gy)
          - (n * gty - CAST(gt AS DOUBLE) * gy)
            * (n * gty - CAST(gt AS DOUBLE) * gy)
            / (n * gtt - CAST(gt AS DOUBLE) * gt)) / n AS sse_pooled
  FROM prefix WHERE t >= 2 AND t <= n - 2
),
best AS (
  SELECT *, sse_l + sse_r AS sse_break,
         ROW_NUMBER() OVER (ORDER BY sse_l + sse_r, t) AS pick
  FROM cand
)
SELECT n AS n_weeks, w AS break_week, t AS break_index,
       {sql_round('slope_l', 4)} AS slope_before,
       {sql_round('slope_r', 4)} AS slope_after,
       {sql_round('sse_pooled', 2)} AS sse_single,
       {sql_round('sse_break', 2)} AS sse_break,
       {sql_round(
           '((sse_pooled - sse_break) / 2.0)'
           ' / (sse_break / (n - 4.0))', 4)} AS chow_f
FROM best WHERE pick = 1
"""


@register("piecewise_trend_break", oracle=_B228_ORACLE)
def piecewise_trend_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-segment piecewise-linear fit of weekly order volume with
    the break grid-searched over every admissible week: each
    candidate's two OLS fits cost O(1) off ONE pass of prefix sums,
    so the whole sup-SSE search is a single window sweep — the
    scale-out answer to 'fit a segmented trend' that never rescans
    the series. Reports the argmin break, both slopes, and the Chow
    F for the break (documented caveat: with the break ESTIMATED,
    sup-F critical values (Andrews) exceed the plain F(2, n-4) —
    the statistic is a ranking score here, not a calibrated test).
    Pettitt (B-track) localises a MEAN shift; this localises a
    SLOPE change — different failure, different repair.

    Exactness: all prefix and total sums are exact 128-bit integers
    (the time index is the exact 1..n ladder); per-candidate SSEs,
    slopes, and the argmin ordering are identical double trees, tie
    broken by the earlier break.

    Scale shape: one fact aggregate to |weeks| rows, one ordered
    prefix window, one rank — O(|weeks|) total work after the scan.
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
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("w")
    indexed = weekly.select(
        "w",
        "y",
        F.row_number().over(w_ord).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    dec = "decimal(38,0)"
    w_pre = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = indexed.select(
        "w",
        "t",
        "n",
        F.sum("t").over(w_pre).cast("bigint").alias("pt"),
        F.sum("y").over(w_pre).cast("bigint").alias("py"),
        F.sum(F.col("t").cast(dec) * F.col("t")).over(w_pre).cast("double").alias("ptt"),
        F.sum(F.col("t").cast(dec) * F.col("y")).over(w_pre).cast("double").alias("pty"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(w_pre).cast("double").alias("pyy"),
        F.sum("t").over(w_all).cast("bigint").alias("gt"),
        F.sum("y").over(w_all).cast("bigint").alias("gy"),
        F.sum(F.col("t").cast(dec) * F.col("t")).over(w_all).cast("double").alias("gtt"),
        F.sum(F.col("t").cast(dec) * F.col("y")).over(w_all).cast("double").alias("gty"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(w_all).cast("double").alias("gyy"),
    )
    t, n = F.col("t").cast("double"), F.col("n").cast("double")
    pt, py = F.col("pt").cast("double"), F.col("py").cast("double")
    gt, gy = F.col("gt").cast("double"), F.col("gy").cast("double")
    m_r = n - t
    rt, ry = gt - pt, gy - py
    rtt = F.col("gtt") - F.col("ptt")
    rty = F.col("gty") - F.col("pty")
    ryy = F.col("gyy") - F.col("pyy")
    ctt_l = t * F.col("ptt") - pt * pt
    cty_l = t * F.col("pty") - pt * py
    cyy_l = t * F.col("pyy") - py * py
    ctt_r = m_r * rtt - rt * rt
    cty_r = m_r * rty - rt * ry
    cyy_r = m_r * ryy - ry * ry
    ctt_g = n * F.col("gtt") - gt * gt
    cty_g = n * F.col("gty") - gt * gy
    cyy_g = n * F.col("gyy") - gy * gy
    cand = prefix.where(
        (F.col("t") >= 2) & (F.col("t") <= F.col("n") - 2)
    ).select(
        "w",
        "t",
        "n",
        ((cyy_l - cty_l * cty_l / ctt_l) / t).alias("sse_l"),
        ((cyy_r - cty_r * cty_r / ctt_r) / m_r).alias("sse_r"),
        (cty_l / ctt_l).alias("slope_l"),
        (cty_r / ctt_r).alias("slope_r"),
        ((cyy_g - cty_g * cty_g / ctt_g) / n).alias("sse_pooled"),
    )
    best = cand.withColumn(
        "sse_break", F.col("sse_l") + F.col("sse_r")
    ).withColumn(
        "pick",
        F.row_number().over(Window.orderBy("sse_break", "t")),
    )
    chow = ((F.col("sse_pooled") - F.col("sse_break")) / 2.0) / (
        F.col("sse_break") / (F.col("n") - 4.0)
    )
    return best.where(F.col("pick") == 1).select(
        F.col("n").alias("n_weeks"),
        F.col("w").alias("break_week"),
        F.col("t").alias("break_index"),
        round_eps(F.col("slope_l"), 4).alias("slope_before"),
        round_eps(F.col("slope_r"), 4).alias("slope_after"),
        round_eps(F.col("sse_pooled"), 2).alias("sse_single"),
        round_eps(F.col("sse_break"), 2).alias("sse_break"),
        round_eps(chow, 4).alias("chow_f"),
    )


# ---------------------------------------------------------------- B229

TK_F_CRIT = 4.543  # F(1, 15) upper 5% — public table value

_B229_ORACLE = f"""
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT))
              AS DOUBLE)
           / COUNT(*) / 100.0 AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
effects AS (
  SELECT seg, pri, y,
         AVG(y) OVER () AS m,
         AVG(y) OVER (PARTITION BY seg) - AVG(y) OVER () AS a,
         AVG(y) OVER (PARTITION BY pri) - AVG(y) OVER () AS b,
         CAST(COUNT(*) OVER (PARTITION BY pri) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS c
  FROM cells
),
sums AS (
  SELECT MAX(r) AS r, MAX(c) AS c,
         SUM(a * b * y) AS sab,
         SUM(a * a) / MAX(c) AS sa2,
         SUM(b * b) / MAX(r) AS sb2,
         SUM((y - m - a - b) * (y - m - a - b)) AS sse
  FROM effects
),
tested AS (
  SELECT r, c,
         sab * sab / (sa2 * sb2) AS ss_nonadd,
         sse
  FROM sums
)
SELECT r AS n_rows, c AS n_cols,
       {sql_round('ss_nonadd', 4)} AS ss_nonadd,
       {sql_round('sse', 4)} AS ss_resid,
       {sql_round(
           'ss_nonadd / ((sse - ss_nonadd)'
           ' / ((r - 1.0) * (c - 1.0) - 1.0))', 4)} AS tukey_f,
       {TK_F_CRIT!r} AS crit_5pct,
       CASE WHEN ss_nonadd / ((sse - ss_nonadd)
                 / ((r - 1.0) * (c - 1.0) - 1.0)) > {TK_F_CRIT!r}
            THEN 1 ELSE 0 END AS reject_additivity
FROM tested
"""


@register("tukey_nonadditivity", oracle=_B229_ORACLE)
def tukey_nonadditivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's one-degree-of-freedom test for nonadditivity on the
    segment x priority grid of mean order values: fits the additive
    row+column model to the 25 cell means and asks whether the
    residual has the single multiplicative pattern a_i*b_j —
    the cheapest possible interaction test. Every B-track margin
    table implicitly assumes additivity (a segment effect that is
    the same in every priority); a significant Tukey F says the
    margins MISLEAD — the 5x5 grid, not the two 5-row margins, is
    the decision table (B129's Simpson audit is the categorical twin
    of this continuous one).

    Exactness: cell means are exact-integer cents sums with one
    division (reported in dollars);
    effects, the nonadditivity contrast, and the F are identical
    double trees over the 25-cell frame.

    Scale shape: one broadcast dim join, one fact-grain aggregate to
    25 cells; everything after is window algebra on that frame.
    """
    cells = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderpriority").alias("pri"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("x"),
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
        .groupBy("seg", "pri")
        .agg(
            (
                F.sum("x").cast("double") / F.count(F.lit(1)) / 100.0
            ).alias("y")
        )
    )
    w_all = Window.partitionBy()
    w_seg = Window.partitionBy("seg")
    w_pri = Window.partitionBy("pri")
    effects = cells.select(
        "seg",
        "pri",
        "y",
        F.avg("y").over(w_all).alias("m"),
        (F.avg("y").over(w_seg) - F.avg("y").over(w_all)).alias("a"),
        (F.avg("y").over(w_pri) - F.avg("y").over(w_all)).alias("b"),
        F.count(F.lit(1)).over(w_pri).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(w_seg).cast("bigint").alias("c"),
    )
    e = F.col("y") - F.col("m") - F.col("a") - F.col("b")
    sums = effects.agg(
        F.max("r").alias("r"),
        F.max("c").alias("c"),
        F.sum(F.col("a") * F.col("b") * F.col("y")).alias("sab"),
        (F.sum(F.col("a") * F.col("a")) / F.max("c")).alias("sa2"),
        (F.sum(F.col("b") * F.col("b")) / F.max("r")).alias("sb2"),
        F.sum(e * e).alias("sse"),
    )
    ss_nonadd = F.col("sab") * F.col("sab") / (F.col("sa2") * F.col("sb2"))
    tested = sums.select(
        "r", "c", ss_nonadd.alias("ss_nonadd"), F.col("sse").alias("sse")
    )
    rd, cd = F.col("r").cast("double"), F.col("c").cast("double")
    tukey_f = F.col("ss_nonadd") / (
        (F.col("sse") - F.col("ss_nonadd")) / ((rd - 1.0) * (cd - 1.0) - 1.0)
    )
    return tested.select(
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        round_eps(F.col("ss_nonadd"), 4).alias("ss_nonadd"),
        round_eps(F.col("sse"), 4).alias("ss_resid"),
        round_eps(tukey_f, 4).alias("tukey_f"),
        F.lit(TK_F_CRIT).alias("crit_5pct"),
        (tukey_f > TK_F_CRIT).cast("int").alias("reject_additivity"),
    )


# ---------------------------------------------------------------- C199

_C199_ORACLE = f"""
WITH per_tok AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (
  SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM per_tok GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, source,
         {sql_hash64("CAST(doc_id AS VARCHAR)")} % 2 AS half,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS d,
         CAST(MAX(c) AS BIGINT) AS cmax
  FROM cnt GROUP BY 1, 2, 3
),
halves AS (
  SELECT source, half,
         AVG(n * 1.0) AS mean_len,
         AVG(d * 1.0 / n) AS mean_ttr,
         AVG(cmax * 1.0 / n) AS mean_top
  FROM per_doc GROUP BY source, half
),
wide AS (
  SELECT source,
         MAX(CASE WHEN half = 0 THEN mean_len END) AS len0,
         MAX(CASE WHEN half = 1 THEN mean_len END) AS len1,
         MAX(CASE WHEN half = 0 THEN mean_ttr END) AS ttr0,
         MAX(CASE WHEN half = 1 THEN mean_ttr END) AS ttr1,
         MAX(CASE WHEN half = 0 THEN mean_top END) AS top0,
         MAX(CASE WHEN half = 1 THEN mean_top END) AS top1
  FROM halves GROUP BY source
),
stacked AS (
  SELECT 'mean_len' AS metric, len0 AS v0, len1 AS v1 FROM wide
  UNION ALL
  SELECT 'mean_ttr', ttr0, ttr1 FROM wide
  UNION ALL
  SELECT 'top_share', top0, top1 FROM wide
),
corr AS (
  SELECT metric, CAST(COUNT(*) AS BIGINT) AS g,
         (COUNT(*) * SUM(v0 * v1) - SUM(v0) * SUM(v1))
           / sqrt((COUNT(*) * SUM(v0 * v0) - SUM(v0) * SUM(v0))
                  * (COUNT(*) * SUM(v1 * v1) - SUM(v1) * SUM(v1))) AS r,
         AVG(abs(v0 - v1)) AS gap
  FROM stacked GROUP BY metric
)
SELECT metric, g AS n_sources,
       {sql_round('r', 6)} AS split_half_r,
       {sql_round('2.0 * r / (1.0 + r)', 6)} AS spearman_brown,
       {sql_round('gap', 6)} AS mean_abs_gap
FROM corr ORDER BY metric
"""


@register("split_half_reliability", oracle=_C199_ORACLE)
def split_half_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half reliability of three per-source corpus metrics
    (mean doc length, mean type/token ratio, mean top-token share):
    each metric is computed independently on two hash-split document
    halves (md5-based, because raw doc_id parity is confounded with
    source in this layout), correlated ACROSS sources, and Spearman-Brown
    corrected (2r/(1+r) — the reliability of the full-sample
    metric). This is the meta-audit under every per-source league
    table in the C-track: a metric with low split-half r does not
    measure a stable property of the source — ranking, gating, or
    mixing on it is ranking on noise, however precise the column
    looks. Psychometrics' oldest trick, pointed at corpus tooling.

    Exactness: per-doc ingredients are exact integers; half-means
    and the cross-source correlation are identical double trees
    (sums-of-products form, no engine corr() builtin).

    Scale shape: rides the standard (doc, token) shuffle once;
    everything after lives at (source, half) grain — 40 rows — and
    the reliability table is 3 rows.
    """
    per_tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    cnt = per_tok.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_doc = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.max("c").cast("bigint").alias("cmax"),
    ).withColumn("half", hash64(F.col("doc_id").cast("string")) % 2)
    halves = per_doc.groupBy("source", "half").agg(
        F.avg(F.col("n") * 1.0).alias("mean_len"),
        F.avg(F.col("d") * 1.0 / F.col("n")).alias("mean_ttr"),
        F.avg(F.col("cmax") * 1.0 / F.col("n")).alias("mean_top"),
    )
    wide = halves.groupBy("source").agg(
        F.max(F.when(F.col("half") == 0, F.col("mean_len"))).alias("len0"),
        F.max(F.when(F.col("half") == 1, F.col("mean_len"))).alias("len1"),
        F.max(F.when(F.col("half") == 0, F.col("mean_ttr"))).alias("ttr0"),
        F.max(F.when(F.col("half") == 1, F.col("mean_ttr"))).alias("ttr1"),
        F.max(F.when(F.col("half") == 0, F.col("mean_top"))).alias("top0"),
        F.max(F.when(F.col("half") == 1, F.col("mean_top"))).alias("top1"),
    )
    stacked = wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mean_len").alias("metric"),
                    F.col("len0").alias("v0"),
                    F.col("len1").alias("v1"),
                ),
                F.struct(
                    F.lit("mean_ttr").alias("metric"),
                    F.col("ttr0").alias("v0"),
                    F.col("ttr1").alias("v1"),
                ),
                F.struct(
                    F.lit("top_share").alias("metric"),
                    F.col("top0").alias("v0"),
                    F.col("top1").alias("v1"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    g = F.count(F.lit(1))
    corr = stacked.groupBy("metric").agg(
        g.cast("bigint").alias("g"),
        (
            (
                g * F.sum(F.col("v0") * F.col("v1"))
                - F.sum("v0") * F.sum("v1")
            )
            / F.sqrt(
                (
                    g * F.sum(F.col("v0") * F.col("v0"))
                    - F.sum("v0") * F.sum("v0")
                )
                * (
                    g * F.sum(F.col("v1") * F.col("v1"))
                    - F.sum("v1") * F.sum("v1")
                )
            )
        ).alias("r"),
        F.avg(F.abs(F.col("v0") - F.col("v1"))).alias("gap"),
    )
    return corr.select(
        "metric",
        F.col("g").alias("n_sources"),
        round_eps(F.col("r"), 6).alias("split_half_r"),
        round_eps(2.0 * F.col("r") / (1.0 + F.col("r")), 6).alias(
            "spearman_brown"
        ),
        round_eps(F.col("gap"), 6).alias("mean_abs_gap"),
    ).orderBy("metric")
