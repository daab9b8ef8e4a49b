"""Hundred-twenty-fourth sweep (SURVEY.md §2 B233-B235).

Jonckheere-Terpstra ordered-alternative k-sample test (Kruskal-Wallis
asks "any difference?"; JT asks "does order value RISE with priority
rank?" — the continuous between-groups twin of Cochran-Armitage, with
the full tie-corrected variance), Moran's I spatial autocorrelation of
customer value over the deterministic geo grid (are rich cells next to
rich cells — the spatial analog of the B-track's temporal ACF, with
the closed-form normality z), and the Diebold-Mariano test that the
naive and MA(4) one-step forecasts of weekly volume differ in squared
loss (rolling_origin_backtest reports losses; DM says whether the gap
is statistically real — forecast-eval inference, not just accounting).
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

# ---------------------------------------------------------------- B233

_B233_ORACLE = f"""
WITH samp AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
gv AS (
  SELECT x,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(SUM(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
         CAST(SUM(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
  FROM samp GROUP BY x
),
ladder AS (
  SELECT c1, c2, c3, c4, c5,
         SUM(c1) OVER w - c1 AS p1, SUM(c2) OVER w - c2 AS p2,
         SUM(c3) OVER w - c3 AS p3, SUM(c4) OVER w - c4 AS p4
  FROM gv
  WINDOW w AS (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
jt AS (
  SELECT CAST(SUM(
           c2 * (2 * p1 + c1)
           + c3 * (2 * (p1 + p2) + c1 + c2)
           + c4 * (2 * (p1 + p2 + p3) + c1 + c2 + c3)
           + c5 * (2 * (p1 + p2 + p3 + p4) + c1 + c2 + c3 + c4)
         ) AS HUGEINT) AS jt2,
         CAST(SUM(CAST(c1 + c2 + c3 + c4 + c5 AS HUGEINT)
                  * (c1 + c2 + c3 + c4 + c5 - 1)
                  * (2 * (c1 + c2 + c3 + c4 + c5) + 5)) AS DOUBLE) AS t25,
         CAST(SUM(CAST(c1 + c2 + c3 + c4 + c5 AS HUGEINT)
                  * (c1 + c2 + c3 + c4 + c5 - 1)
                  * (c1 + c2 + c3 + c4 + c5 - 2)) AS DOUBLE) AS t12,
         CAST(SUM(CAST(c1 + c2 + c3 + c4 + c5 AS HUGEINT)
                  * (c1 + c2 + c3 + c4 + c5 - 1)) AS DOUBLE) AS t1
  FROM ladder
),
grp AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(ng AS HUGEINT) * ng) AS DOUBLE) AS sn2,
         CAST(SUM(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5))
              AS DOUBLE) AS g25,
         CAST(SUM(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2))
              AS DOUBLE) AS g12,
         CAST(SUM(CAST(ng AS HUGEINT) * (ng - 1)) AS DOUBLE) AS g1
  FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng FROM samp GROUP BY g)
),
stat AS (
  SELECT CAST(jt2 AS DOUBLE) / 2 AS jt_stat,
         (CAST(n AS DOUBLE) * n - sn2) / 4 AS mu,
         (CAST(n AS DOUBLE) * (n - 1.0) * (2 * n + 5) - g25 - t25) / 72.0
           + g12 * t12 / (36.0 * n * (n - 1.0) * (n - 2.0))
           + g1 * t1 / (8.0 * n * (n - 1.0)) AS v,
         n
  FROM jt, grp
)
SELECT n,
       {sql_round('jt_stat', 1)} AS jt_stat,
       {sql_round('mu', 1)} AS jt_mean,
       {sql_round('(jt_stat - mu) / sqrt(v)', 6)} AS z,
       {sql_round('2 * ' + sql_normal_sf_abs('(jt_stat - mu) / sqrt(v)'),
                  6)} AS p_two_sided,
       CASE WHEN jt_stat < mu THEN 1 ELSE 0 END AS value_falls_with_rank
FROM stat
"""


@register("jonckheere_terpstra", oracle=_B233_ORACLE)
def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test: does order value
    trend MONOTONICALLY across the priority ranks 1-URGENT → 5-LOW?
    Kruskal-Wallis (B134) spends power on every permutation of group
    means; JT orders the alternative and concentrates it — the
    between-groups continuous twin of Cochran-Armitage (binary) and
    Page's L (within-block). JT = sum over group pairs g<h of
    Mann-Whitney counts, computed WITHOUT pairs: one value-grain
    ladder carries, per distinct value, each group's strictly-below
    cumulative, and doubled counts (wins*2 + ties) keep everything
    integral. Full Lehmann tie-corrected variance from exact 128-bit
    tie/group sums; two-sided normal p.

    Exactness: JT*2 and all variance ingredients are exact integers;
    the z and p are identical double trees.

    Scale shape: one fact pass to value grain (the 5 group counts
    pivot map-side), one |values| ladder window, two reductions.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("x"),
    )
    gv = samp.groupBy("x").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i in range(1, 6)
        ]
    )
    w_cum = (
        Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ladder = gv.select(
        *[F.col(f"c{i}") for i in range(1, 6)],
        *[
            (F.sum(f"c{i}").over(w_cum) - F.col(f"c{i}")).alias(f"p{i}")
            for i in range(1, 5)
        ],
    )
    t = sum(F.col(f"c{i}") for i in range(1, 6))
    dec = "decimal(38,0)"
    th = t.cast(dec)
    jt2_term = (
        F.col("c2") * (2 * F.col("p1") + F.col("c1"))
        + F.col("c3")
        * (2 * (F.col("p1") + F.col("p2")) + F.col("c1") + F.col("c2"))
        + F.col("c4")
        * (
            2 * (F.col("p1") + F.col("p2") + F.col("p3"))
            + F.col("c1")
            + F.col("c2")
            + F.col("c3")
        )
        + F.col("c5")
        * (
            2 * (F.col("p1") + F.col("p2") + F.col("p3") + F.col("p4"))
            + F.col("c1")
            + F.col("c2")
            + F.col("c3")
            + F.col("c4")
        )
    )
    jt = ladder.agg(
        F.sum(jt2_term.cast(dec)).alias("jt2"),
        F.sum(th * (t - 1) * (2 * t + 5)).cast("double").alias("t25"),
        F.sum(th * (t - 1) * (t - 2)).cast("double").alias("t12"),
        F.sum(th * (t - 1)).cast("double").alias("t1"),
    )
    per_g = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng")
    )
    ngh = F.col("ng").cast(dec)
    grp = per_g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(ngh * F.col("ng")).cast("double").alias("sn2"),
        F.sum(ngh * (F.col("ng") - 1) * (2 * F.col("ng") + 5))
        .cast("double")
        .alias("g25"),
        F.sum(ngh * (F.col("ng") - 1) * (F.col("ng") - 2))
        .cast("double")
        .alias("g12"),
        F.sum(ngh * (F.col("ng") - 1)).cast("double").alias("g1"),
    )
    st = attach_scalars(jt, grp)
    nd = F.col("n").cast("double")
    jt_stat = F.col("jt2").cast("double") / 2
    mu = (nd * F.col("n") - F.col("sn2")) / 4
    v = (
        (nd * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
         - F.col("g25") - F.col("t25")) / 72.0
        + F.col("g12") * F.col("t12")
        / (36.0 * nd * (F.col("n") - 1.0) * (F.col("n") - 2.0))
        + F.col("g1") * F.col("t1") / (8.0 * nd * (F.col("n") - 1.0))
    )
    z = (jt_stat - mu) / F.sqrt(v)
    return st.select(
        "n",
        round_eps(jt_stat, 1).alias("jt_stat"),
        round_eps(mu, 1).alias("jt_mean"),
        round_eps(z, 6).alias("z"),
        round_eps(2 * normal_sf_abs(z), 6).alias("p_two_sided"),
        (jt_stat < mu).cast("int").alias("value_falls_with_rank"),
    )


# ---------------------------------------------------------------- B234

MORAN_CELL_DEG = 0.5

_B234_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(c_acctbal * 100 + 1e-9) AS BIGINT) AS bal_c,
         CAST(FLOOR((50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))
                             ::BIGINT % 5000) / 1000.0)
                    / {MORAN_CELL_DEG!r}) AS BIGINT) AS ci,
         CAST(FLOOR((-5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))
                             ::BIGINT % 10000) / 1000.0)
                    / {MORAN_CELL_DEG!r}) AS BIGINT) AS cj
  FROM customer
),
cells AS (
  SELECT ci, cj,
         CAST(SUM(bal_c) AS BIGINT) AS sb,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pts GROUP BY ci, cj
),
xs AS (
  SELECT ci, cj, CAST(sb AS DOUBLE) / cnt / 100.0 AS x FROM cells
),
mean_x AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) / COUNT(*) AS xbar FROM xs
),
dev AS (
  SELECT ci, cj, x - m.xbar AS d FROM xs, mean_x m
),
edges AS (
  SELECT a.d AS da, b.d AS db
  FROM dev a JOIN dev b
    ON (ABS(a.ci - b.ci) + ABS(a.cj - b.cj)) = 1
),
deg AS (
  SELECT a.ci, a.cj, CAST(COUNT(*) AS BIGINT) AS k
  FROM dev a JOIN dev b
    ON (ABS(a.ci - b.ci) + ABS(a.cj - b.cj)) = 1
  GROUP BY a.ci, a.cj
),
sums AS (
  SELECT (SELECT SUM(da * db) FROM edges) AS cross_sum,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS s0,
         (SELECT SUM(d * d) FROM dev) AS ss,
         (SELECT n FROM mean_x) AS n,
         (SELECT CAST(SUM(4 * k * k) AS BIGINT) FROM deg) AS s2
),
stat AS (
  SELECT n, s0,
         (CAST(n AS DOUBLE) / s0) * cross_sum / ss AS i_obs,
         -1.0 / (n - 1.0) AS e_i,
         (CAST(n AS DOUBLE) * n * (2.0 * s0) - n * s2
          + 3.0 * CAST(s0 AS DOUBLE) * s0)
           / (CAST(s0 AS DOUBLE) * s0 * (CAST(n AS DOUBLE) * n - 1.0))
           - (1.0 / (n - 1.0)) * (1.0 / (n - 1.0)) AS var_i
  FROM sums
)
SELECT n AS n_cells, s0 AS directed_edges,
       {sql_round('i_obs', 6)} AS moran_i,
       {sql_round('e_i', 6)} AS expected_i,
       {sql_round('(i_obs - e_i) / sqrt(var_i)', 6)} AS z,
       {sql_round('2 * ' + sql_normal_sf_abs('(i_obs - e_i) / sqrt(var_i)'),
                  6)} AS p_two_sided
FROM stat
"""


@register("morans_i", oracle=_B234_ORACLE)
def morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of mean customer balance
    over the deterministic geo grid (geo_grid_join's hash-placed
    points, 0.5-degree cells, rook adjacency): are rich cells next
    to rich cells? The spatial sibling of the B-track's temporal ACF
    — positive I means value CLUSTERS in space, so any cell-level
    sampling or regional rollup has fewer effective observations
    than rows. Reports the exact E[I] = -1/(n-1) and the closed-form
    normality variance (binary symmetric weights: S1 = 2*S0,
    S2 = 4*sum deg^2), with the two-sided normal p.

    Exactness: balances are exact cents; cell means divide exact
    integer sums; the adjacency join and degree counts are integer;
    both engines run the identical double tree after that.

    Scale shape: points collapse to cells map-side (one groupBy);
    the rook self-join keys on only 4 neighbour offsets of a
    |cells|-sized frame — never the point cloud; three reductions.
    Reference: the regional aggregation maps the observatory
    publishes (indexes/per-region tiles).
    """
    cust = load_table(spark, sf_dir, "customer")

    def _frac(prefix: str, modulus: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix),
                                   F.col("c_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % modulus
        )

    pts = cust.select(
        F.round(F.col("c_acctbal") * 100 + 1e-9).cast("bigint").alias(
            "bal_c"
        ),
        F.floor((50.0 + _frac("g", 5000) / 1000.0) / MORAN_CELL_DEG)
        .cast("bigint")
        .alias("ci"),
        F.floor((-5.0 + _frac("h", 10000) / 1000.0) / MORAN_CELL_DEG)
        .cast("bigint")
        .alias("cj"),
    )
    cells = pts.groupBy("ci", "cj").agg(
        F.sum("bal_c").cast("bigint").alias("sb"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    xs = cells.select(
        "ci",
        "cj",
        (F.col("sb").cast("double") / F.col("cnt") / 100.0).alias("x"),
    )
    mean_x = xs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("x") / F.count(F.lit(1))).alias("xbar"),
    )
    dev = attach_scalars(xs, mean_x).select(
        "ci", "cj", (F.col("x") - F.col("xbar")).alias("d"), "n"
    )
    dev = dev.persist()
    # Rook adjacency via the 4 neighbour OFFSET KEYS: explode each
    # cell into its (ci+di, cj+dj) probes and equi-join back to the
    # broadcast cell frame on (ci, cj) — a hash join, never a
    # non-equi nested loop over |cells|^2.
    offsets = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    probes = dev.select(
        "ci", "cj", "d", F.explode(offsets).alias("o")
    ).select(
        "ci",
        "cj",
        "d",
        (F.col("ci") + F.col("o.di")).alias("nci"),
        (F.col("cj") + F.col("o.dj")).alias("ncj"),
    )
    edges = probes.join(
        F.broadcast(
            dev.select(
                F.col("ci").alias("nci"),
                F.col("cj").alias("ncj"),
                F.col("d").alias("bd"),
            )
        ),
        ["nci", "ncj"],
    ).select("ci", "cj", (F.col("d") * F.col("bd")).alias("dd"))
    edge_sums = edges.agg(
        F.sum("dd").alias("cross_sum"),
        F.count(F.lit(1)).cast("bigint").alias("s0"),
    )
    deg = edges.groupBy("ci", "cj").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    s2 = deg.agg(
        F.sum(4 * F.col("k") * F.col("k")).cast("bigint").alias("s2")
    )
    base = dev.agg(
        F.sum(F.col("d") * F.col("d")).alias("ss"),
        F.max("n").alias("n"),
    )
    st = attach_scalars(attach_scalars(edge_sums, s2), base)
    nd = F.col("n").cast("double")
    s0d = F.col("s0").cast("double")
    i_obs = (nd / F.col("s0")) * F.col("cross_sum") / F.col("ss")
    e_i = -1.0 / (F.col("n") - 1.0)
    var_i = (
        nd * F.col("n") * (2.0 * F.col("s0"))
        - nd * F.col("s2")
        + 3.0 * s0d * F.col("s0")
    ) / (s0d * F.col("s0") * (nd * F.col("n") - 1.0)) - (
        1.0 / (F.col("n") - 1.0)
    ) * (1.0 / (F.col("n") - 1.0))
    z = (i_obs - e_i) / F.sqrt(var_i)
    return st.select(
        F.col("n").alias("n_cells"),
        F.col("s0").alias("directed_edges"),
        round_eps(i_obs, 6).alias("moran_i"),
        round_eps(e_i, 6).alias("expected_i"),
        round_eps(z, 6).alias("z"),
        round_eps(2 * normal_sf_abs(z), 6).alias("p_two_sided"),
    )


# ---------------------------------------------------------------- B235

_B235_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT w, y,
         LAG(y, 1) OVER (ORDER BY w) AS l1,
         LAG(y, 2) OVER (ORDER BY w) AS l2,
         LAG(y, 3) OVER (ORDER BY w) AS l3,
         LAG(y, 4) OVER (ORDER BY w) AS l4,
         CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS t
  FROM weekly
),
losses AS (
  SELECT 16 * (y - l1) * (y - l1)
           - (4 * y - l1 - l2 - l3 - l4)
             * (4 * y - l1 - l2 - l3 - l4) AS d16
  FROM lagged WHERE t >= 5
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(d16) AS HUGEINT) AS sd,
         CAST(SUM(CAST(d16 AS HUGEINT) * d16) AS DOUBLE) AS sdd
  FROM losses
)
SELECT t AS n_forecasts,
       {sql_round('CAST(sd AS DOUBLE) / t / 16.0', 6)} AS mean_loss_diff,
       {sql_round(
           '(CAST(sd AS DOUBLE) / t)'
           ' / sqrt((sdd - CAST(sd AS DOUBLE) * sd / t) / (t - 1.0) / t)',
           6)} AS dm_stat,
       {sql_round(
           '2 * ' + sql_normal_sf_abs(
               '(CAST(sd AS DOUBLE) / t)'
               ' / sqrt((sdd - CAST(sd AS DOUBLE) * sd / t)'
               '        / (t - 1.0) / t)'), 6)} AS p_two_sided,
       CASE WHEN sd > 0 THEN 'ma4' ELSE 'naive' END AS better_forecast
FROM mom
"""


@register("diebold_mariano", oracle=_B235_ORACLE)
def diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano test that the naive (last week) and MA(4)
    one-step forecasts of weekly order volume genuinely differ in
    squared loss. rolling_origin_backtest (B113) reports loss
    ACCOUNTING; DM supplies the missing INFERENCE — the loss
    differential d_t = e_naive^2 - e_ma4^2 is itself a time series,
    and DM = mean(d)/se(mean(d)) (h=1, so the lag-0 variance is the
    standard choice). Scaling d by 16 makes every term an exact
    integer (the MA(4) error times 4 is integral), so both engines
    sum IDENTICAL integers and the statistic is scale-invariant.

    Exactness: d16 and its square are exact 128-bit integers; the
    mean, se, z and p are identical double trees.

    Scale shape: one fact aggregate to |weeks| rows, one lag window,
    one reduction.
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
    w_ord = Window.orderBy("w")
    lagged = weekly.select(
        "y",
        F.lag("y", 1).over(w_ord).alias("l1"),
        F.lag("y", 2).over(w_ord).alias("l2"),
        F.lag("y", 3).over(w_ord).alias("l3"),
        F.lag("y", 4).over(w_ord).alias("l4"),
        F.row_number().over(w_ord).cast("bigint").alias("t"),
    )
    e4 = (
        4 * F.col("y")
        - F.col("l1")
        - F.col("l2")
        - F.col("l3")
        - F.col("l4")
    )
    d16 = (
        16 * (F.col("y") - F.col("l1")) * (F.col("y") - F.col("l1"))
        - e4 * e4
    )
    losses = lagged.where(F.col("t") >= 5).select(d16.alias("d16"))
    dec = "decimal(38,0)"
    mom = losses.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.col("d16").cast(dec)).alias("sd"),
        F.sum(F.col("d16").cast(dec) * F.col("d16"))
        .cast("double")
        .alias("sdd"),
    )
    td = F.col("t").cast("double")
    sdd_ = F.col("sd").cast("double")
    dbar = sdd_ / td
    se = F.sqrt(
        (F.col("sdd") - sdd_ * F.col("sd").cast("double") / td)
        / (td - 1.0)
        / td
    )
    dm = dbar / se
    return mom.select(
        F.col("t").alias("n_forecasts"),
        round_eps(sdd_ / td / 16.0, 6).alias("mean_loss_diff"),
        round_eps(dm, 6).alias("dm_stat"),
        round_eps(2 * normal_sf_abs(dm), 6).alias("p_two_sided"),
        F.when(F.col("sd") > 0, "ma4")
        .otherwise("naive")
        .alias("better_forecast"),
    )
