"""Eighty-first sweep (SURVEY.md §2 B148-B149, C156).

Brown-Forsythe variance-homogeneity test (the robust Levene variant
on absolute deviations from group MEDIANS — the precondition check
B144's equal-variance ANOVA quietly assumes), a Little's-law audit
(L = lambda x W measured against the clipped occupancy integral over
a fixed calendar window — the queueing identity every capacity model
leans on, with the finite-horizon gap made visible), and the token
position profile (where in documents do the most frequent tokens
sit — tokens pinned to document starts/ends are template/boilerplate
smell that frequency alone can't see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B148

_B148_ORACLE = f"""
WITH samp AS (
  SELECT l_returnflag AS g, CAST(ROUND(l_quantity) AS BIGINT) AS x
  FROM lineitem
),
gv AS (
  SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM samp GROUP BY g, x
),
cum AS (
  SELECT g, x, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS c
  FROM gv
),
gn AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g FROM gv GROUP BY g),
med AS (
  SELECT c.g,
         CAST(MIN(CASE WHEN c.c >= (gn.n_g + 1) // 2 THEN c.x END)
              + MIN(CASE WHEN c.c >= (gn.n_g + 2) // 2 THEN c.x END)
           AS BIGINT) AS med2
  FROM cum c JOIN gn USING (g) GROUP BY c.g
),
z AS (
  SELECT gv.g, gv.cnt, ABS(2 * gv.x - med.med2) AS z2
  FROM gv JOIN med USING (g)
),
grp AS (
  SELECT g,
         CAST(SUM(cnt) AS BIGINT) AS n_g,
         CAST(SUM(cnt * z2) AS BIGINT) AS s1,
         CAST(SUM(cnt * z2 * z2) AS BIGINT) AS s2
  FROM z GROUP BY g
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s1) AS BIGINT) AS s1t,
         CAST(SUM(s2) AS DOUBLE) AS s2d,
         SUM(CAST(s1 * s1 AS DOUBLE) / n_g) AS sumt,
         MAX(s1 * 1.0 / n_g) AS zbar_max,
         MIN(s1 * 1.0 / n_g) AS zbar_min
  FROM grp
)
SELECT k, n,
       {sql_round(
           '((sumt - CAST(s1t AS DOUBLE) * s1t / n) / (k - 1))'
           ' / ((s2d - sumt) / (n - k))', 6)} AS bf_f_stat,
       {sql_round('zbar_max / zbar_min', 6)} AS spread_ratio
FROM red
"""


@register("brown_forsythe", oracle=_B148_ORACLE)
def brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test of line quantity
    across return flags: one-way ANOVA F computed on |x - median_g|
    (median centering makes it robust where classic Levene's mean
    centering is not) — the equal-variance precondition B144 assumes
    and B143's normality gate can't check. Also reports the max/min
    ratio of group mean absolute deviations.

    Exactness: per-group medians come from cumulative counts over the
    bounded (group, value) grid — DOUBLED medians stay exact BIGINTs
    (B91's trick), so the deviations z = |2x - med2| and all ANOVA
    sufficient statistics are exact integers (F is scale-invariant,
    so testing on 2z equals testing on z); one double division at
    the end.

    Scale shape: fact collapses once to the bounded grid; medians,
    deviations and the F reduction all run at grid/group grain.
    """
    samp = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
    )
    gv = samp.groupBy("g", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    gv = gv.persist()
    w_cum = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gv.select(
        "g", "x", F.sum("cnt").over(w_cum).cast("bigint").alias("c")
    )
    gn = gv.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n_g"))
    med = (
        cum.join(F.broadcast(gn), "g")
        .groupBy("g")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("c") >= F.floor((F.col("n_g") + 1) / 2),
                        F.col("x"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("c") >= F.floor((F.col("n_g") + 2) / 2),
                        F.col("x"),
                    )
                )
            )
            .cast("bigint")
            .alias("med2")
        )
    )
    z = gv.join(F.broadcast(med), "g").select(
        "g", "cnt", F.abs(2 * F.col("x") - F.col("med2")).alias("z2")
    )
    grp = z.groupBy("g").agg(
        F.sum("cnt").cast("bigint").alias("n_g"),
        F.sum(F.col("cnt") * F.col("z2")).cast("bigint").alias("s1"),
        F.sum(F.col("cnt") * F.col("z2") * F.col("z2"))
        .cast("bigint")
        .alias("s2"),
    )
    red = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s1").cast("bigint").alias("s1t"),
        F.sum("s2").cast("double").alias("s2d"),
        F.sum(
            (F.col("s1") * F.col("s1")).cast("double") / F.col("n_g")
        ).alias("sumt"),
        F.max(F.col("s1") * 1.0 / F.col("n_g")).alias("zbar_max"),
        F.min(F.col("s1") * 1.0 / F.col("n_g")).alias("zbar_min"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = F.col("sumt") - F.col("s1t").cast("double") * F.col("s1t") / n
    ssw = F.col("s2d") - F.col("sumt")
    return red.select(
        "k",
        "n",
        round_eps((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("bf_f_stat"),
        round_eps(F.col("zbar_max") / F.col("zbar_min"), 6).alias(
            "spread_ratio"
        ),
    )


# ---------------------------------------------------------------- B149

LL_WIN_START = "1997-01-01"
LL_WIN_END = "1998-01-01"
LL_WIN_DAYS = 365

_B149_ORACLE = f"""
WITH items AS (
  SELECT o.o_orderdate AS s, l.l_shipdate AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate < DATE '{LL_WIN_END}'
    AND l.l_shipdate > DATE '{LL_WIN_START}'
),
shipped AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_shipped,
         CAST(SUM(datediff('day', s, r)) AS BIGINT) AS sum_days
  FROM items
  WHERE s >= DATE '{LL_WIN_START}' AND s < DATE '{LL_WIN_END}'
),
clipped AS (
  SELECT greatest(s, DATE '{LL_WIN_START}') AS cs,
         least(r, DATE '{LL_WIN_END}') AS ce
  FROM items
),
deltas AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM (
    SELECT cs AS d, 1 AS delta FROM clipped
    UNION ALL
    SELECT ce AS d, -1 AS delta FROM clipped
    UNION ALL
    SELECT DATE '{LL_WIN_END}' AS d, 0 AS delta
  ) GROUP BY d
),
sweep AS (
  SELECT d,
         CAST(SUM(delta) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS open_cnt,
         COALESCE(datediff('day', d, LEAD(d) OVER (ORDER BY d)), 0)
           AS seg_days
  FROM deltas
),
occ AS (
  SELECT CAST(SUM(open_cnt * seg_days) AS BIGINT) AS occupancy
  FROM sweep
)
SELECT n_shipped,
       {sql_round(f'n_shipped * 1.0 / {LL_WIN_DAYS}', 6)} AS lambda_per_day,
       {sql_round('sum_days * 1.0 / n_shipped', 6)} AS w_avg_days,
       {sql_round(
           f'(n_shipped * 1.0 / {LL_WIN_DAYS})'
           ' * (sum_days * 1.0 / n_shipped)', 6)} AS l_implied,
       {sql_round(f'occupancy * 1.0 / {LL_WIN_DAYS}', 6)} AS l_measured,
       {sql_round(
           f'(occupancy * 1.0 / {LL_WIN_DAYS}'
           f'  - (n_shipped * 1.0 / {LL_WIN_DAYS})'
           '    * (sum_days * 1.0 / n_shipped)) * 100.0'
           f' / ((n_shipped * 1.0 / {LL_WIN_DAYS})'
           '     * (sum_days * 1.0 / n_shipped))', 4)} AS rel_gap_pct
FROM shipped CROSS JOIN occ
"""


@register("little_law_audit", oracle=_B149_ORACLE)
def little_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law audit over the {LL_WIN_START[:4]} calendar year:
    arrival rate lambda (lineitems ORDERED per day), mean time to
    ship W (orderdate -> shipdate), and the implied work-in-progress
    L = lambda x W, against L actually MEASURED as the clipped
    occupancy integral (sweep-line over the window) — the relative
    gap is the finite-horizon boundary effect every capacity model
    built on the identity silently carries. Same sweep-line kernel
    as B116's peak concurrency, asked the queueing-theory question.

    Exactness: durations, deltas, the running count and the
    occupancy integral are all exact BIGINTs (date arithmetic only);
    three final double divisions.

    Scale shape: one fact scan emits +-1 boundary deltas; the sweep
    runs over the bounded |dates-in-window| frame (<=367 rows);
    shipped-count stats are one more map-side aggregate of the same
    scan.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_shipdate").alias("r"))
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("s"),
            ),
            "ok",
        )
        .select("s", "r")
    )
    win_s = F.lit(LL_WIN_START).cast("date")
    win_e = F.lit(LL_WIN_END).cast("date")
    items = li.where((F.col("s") < win_e) & (F.col("r") > win_s))
    items = items.persist()
    shipped = items.where(
        (F.col("s") >= win_s) & (F.col("s") < win_e)
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shipped"),
        F.sum(F.datediff(F.col("r"), F.col("s")))
        .cast("bigint")
        .alias("sum_days"),
    )
    clipped = items.select(
        F.greatest(F.col("s"), win_s).alias("cs"),
        F.least(F.col("r"), win_e).alias("ce"),
    )
    deltas = (
        clipped.select(F.col("cs").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            clipped.select(F.col("ce").alias("d"), F.lit(-1).alias("delta"))
        )
        .unionAll(
            clipped.limit(1).select(
                win_e.alias("d"), F.lit(0).alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").cast("bigint").alias("delta"))
    )
    w_d = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = deltas.select(
        "d",
        F.sum("delta").over(w_d).cast("bigint").alias("open_cnt"),
        F.coalesce(
            F.datediff(F.lead("d").over(Window.orderBy("d")), F.col("d")),
            F.lit(0),
        ).alias("seg_days"),
    )
    occ = sweep.agg(
        F.sum(F.col("open_cnt") * F.col("seg_days"))
        .cast("bigint")
        .alias("occupancy")
    )
    lam = F.col("n_shipped") * 1.0 / LL_WIN_DAYS
    w_avg = F.col("sum_days") * 1.0 / F.col("n_shipped")
    l_imp = lam * w_avg
    l_meas = F.col("occupancy") * 1.0 / LL_WIN_DAYS
    return shipped.transform(scalars(occ)).select(
        "n_shipped",
        round_eps(lam, 6).alias("lambda_per_day"),
        round_eps(w_avg, 6).alias("w_avg_days"),
        round_eps(l_imp, 6).alias("l_implied"),
        round_eps(l_meas, 6).alias("l_measured"),
        round_eps((l_meas - l_imp) * 100.0 / l_imp, 4).alias("rel_gap_pct"),
    )


# ---------------------------------------------------------------- C156

TPP_TOP_N = 20

_C156_ORACLE = f"""
WITH toksrc AS (
  SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents
),
pos AS (
  SELECT u.tok AS tok, CAST(u.pm AS BIGINT) AS pm FROM (
    SELECT unnest(list_transform(
      generate_series(1, len(t)),
      i -> {{'tok': t[i], 'pm': (i * 1000) // len(t)}})) AS u
    FROM toksrc
  )
),
per_tok AS (
  SELECT tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(pm) AS BIGINT) AS s1,
         CAST(SUM(pm * pm) AS BIGINT) AS s2
  FROM pos GROUP BY tok
),
ranked AS (
  SELECT tok, freq, s1, s2,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rk
  FROM per_tok
)
SELECT tok, freq,
       {sql_round('s1 * 1.0 / freq / 1000.0', 6)} AS mean_rel_pos,
       {sql_round(
           'sqrt((freq * 1.0 * s2 - CAST(s1 AS DOUBLE) * s1)'
           ' / ((freq * 1.0) * (freq - 1))) / 1000.0', 6)} AS std_rel_pos
FROM ranked WHERE rk <= {TPP_TOP_N}
ORDER BY freq DESC, tok
"""


@register("token_position_profile", oracle=_C156_ORACLE)
def token_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional profile of the top-{TPP_TOP_N} most frequent
    tokens: mean and spread of each token's RELATIVE position inside
    its documents. Content words float (mean ~0.5, high spread);
    template/boilerplate tokens pin to document starts or ends (mean
    near 0 or 1, low spread) — the structural signal raw frequency
    (C30) and tf-idf (A19) are blind to, and the cheap screen before
    C153's passage fingerprinting names the actual spans.

    Exactness: relative position is quantised map-side to an exact
    integer permille ((i * 1000) div len — floor division in both
    engines, no float in the hot path), so per-token moment sums are
    exact BIGINTs; mean/std are O(1) algebra per surviving token.

    Scale shape: one posexplode to token grain (the same volume C30's
    frequency count already shuffles), one aggregate, then a global
    top-N window over token-grain rows with a deterministic
    (freq desc, token) tiebreak — TakeOrdered at scale.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    pos = docs.select(
        F.size("t").alias("len"),
        F.posexplode("t").alias("p0", "tok"),
    ).select(
        "tok",
        F.expr("((p0 + 1) * 1000) div len").cast("bigint").alias("pm"),
    )
    per_tok = pos.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("pm").cast("bigint").alias("s1"),
        F.sum(F.col("pm") * F.col("pm")).cast("bigint").alias("s2"),
    )
    w_rk = Window.orderBy(F.col("freq").desc(), F.col("tok"))
    ranked = per_tok.withColumn("rk", F.row_number().over(w_rk)).where(
        F.col("rk") <= TPP_TOP_N
    )
    freq, s1, s2 = F.col("freq"), F.col("s1"), F.col("s2")
    return ranked.select(
        "tok",
        "freq",
        round_eps(s1 * 1.0 / freq / 1000.0, 6).alias("mean_rel_pos"),
        round_eps(
            F.sqrt(
                (freq * 1.0 * s2 - s1.cast("double") * s1)
                / ((freq * 1.0) * (freq - 1))
            )
            / 1000.0,
            6,
        ).alias("std_rel_pos"),
    ).orderBy(F.col("freq").desc(), "tok")
