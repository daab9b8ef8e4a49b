"""Hundred-second sweep (SURVEY.md §2 B189-B190, C178).

Indirect standardization / SMR (observed-over-expected using
reference rates — epidemiology's league-table correction; B182
standardizes directly, this is the small-stratum-safe twin),
generalized ESD (three Grubbs rounds with removal — the multiple-
outlier detector B150's single-shot test provably fails at, via
masking), and the Zipf-Mandelbrot grid fit (the rank-offset beta
that fixes plain Zipf's head misfit, chosen by deterministic
R-squared grid search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B189

_B189_ORACLE = f"""
WITH li AS (
  SELECT s.s_nationkey AS nation, l.l_returnflag AS rf,
         o.o_orderpriority AS stratum
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ref AS (
  SELECT stratum,
         SUM(CASE WHEN rf = 'R' THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
           AS ref_rate
  FROM li GROUP BY stratum
),
nat AS (
  SELECT nation, stratum,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rf = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS obs
  FROM li GROUP BY nation, stratum
),
smr AS (
  SELECT nation,
         CAST(SUM(obs) AS BIGINT) AS observed,
         SUM(n * ref.ref_rate) AS expected
  FROM nat JOIN ref USING (stratum)
  GROUP BY nation
)
SELECT nation, observed,
       {sql_round('expected', 4)} AS expected,
       {sql_round('observed / expected', 6)} AS smr,
       {sql_round(
           'observed / expected'
           ' - 1.96 * sqrt(observed * 1.0) / expected', 6)} AS ci_lo,
       {sql_round(
           'observed / expected'
           ' + 1.96 * sqrt(observed * 1.0) / expected', 6)} AS ci_hi
FROM smr ORDER BY nation
"""


@register("smr_indirect", oracle=_B189_ORACLE)
def smr_indirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized return ratio per supplier nation by INDIRECT
    standardization: expected returns = each nation's line mix
    priced at the GLOBAL per-priority return rates, SMR = observed /
    expected with the Poisson-approximate 95% CI — the epidemiology
    league-table correction that stays stable when a nation's
    strata are thin (where B182's direct standardization of small
    strata explodes). SMR > 1 after mix adjustment is a real
    quality signal, not a priority-mix artifact.

    Exactness: observed counts and stratum sizes are exact BIGINTs;
    reference rates and expecteds are identical IEEE shapes; one
    |nations|-row output.

    Scale shape: two broadcast-dim-style key joins feed ONE
    (nation, stratum) aggregate; the reference-rate frame is
    |strata| rows joined back at that grain.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            F.col("l_returnflag").alias("rf"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "supplier").select(
                    F.col("s_suppkey").alias("sk"),
                    F.col("s_nationkey").alias("nation"),
                )
            ),
            "sk",
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderpriority").alias("stratum"),
            ),
            "ok",
        )
    )
    nat = li.groupBy("nation", "stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("rf") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("obs"),
    )
    nat = nat.persist()
    ref = nat.groupBy("stratum").agg(
        (F.sum("obs") * 1.0 / F.sum("n")).alias("ref_rate")
    )
    smr = (
        nat.join(F.broadcast(ref), "stratum")
        .groupBy("nation")
        .agg(
            F.sum("obs").cast("bigint").alias("observed"),
            F.sum(F.col("n") * F.col("ref_rate")).alias("expected"),
        )
    )
    o, e = F.col("observed"), F.col("expected")
    ratio = o / e
    half = 1.96 * F.sqrt(o * 1.0) / e
    return smr.select(
        "nation",
        "observed",
        round_eps(e, 4).alias("expected"),
        round_eps(ratio, 6).alias("smr"),
        round_eps(ratio - half, 6).alias("ci_lo"),
        round_eps(ratio + half, 6).alias("ci_hi"),
    ).orderBy("nation")


# ---------------------------------------------------------------- B190

ESD_ROUNDS = 3


def _b190_round_cte(r: int) -> str:
    prev = f"f{r - 1}"
    return f"""
st{r} AS (
  SELECT d, v,
         (v - AVG(v) OVER ()) AS dev,
         sqrt((COUNT(*) OVER () * SUM(v * v) OVER ()
               - SUM(v) OVER () * SUM(v) OVER ())
              / ((COUNT(*) OVER () * 1.0) * (COUNT(*) OVER () - 1)))
           AS sd
  FROM {prev}
),
rk{r} AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(dev) DESC, d) AS rk
  FROM st{r}
),
out{r} AS (
  SELECT {r} AS round, strftime(d, '%Y-%m-%d') AS removed_day,
         ABS(dev) / sd AS g_stat
  FROM rk{r} WHERE rk = 1
),
f{r} AS (SELECT d, v FROM rk{r} WHERE rk > 1)"""


_B190_ORACLE = f"""
WITH f0 AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) * 1.0 AS v
  FROM orders GROUP BY o_orderdate
),
{", ".join(_b190_round_cte(r).strip() for r in range(1, ESD_ROUNDS + 1))}
SELECT round, removed_day, {sql_round('g_stat', 6)} AS g_stat
FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2
      UNION ALL SELECT * FROM out3)
ORDER BY round
"""


@register("generalized_esd", oracle=_B190_ORACLE)
def generalized_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD: {ESD_ROUNDS} successive Grubbs rounds on the
    daily revenue series, each removing the most extreme day and
    re-estimating mean/sd before the next — the multiple-outlier
    procedure that defeats MASKING (two outliers inflate the sd
    enough that B150's single-shot test sees neither). Reports each
    round's removed day and its G statistic.

    Exactness: each round's mean/sd come from window sums over the
    current bounded frame with identical IEEE shapes; the removal
    is a deterministic (|dev| desc, day) rank; the {ESD_ROUNDS}
    stages are generated from one template in BOTH engines, so they
    cannot drift.

    Scale shape: fact collapses to |days| once; each round is two
    window passes over the shrinking bounded frame.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100 + 1e-9).cast(
                        "bigint"
                    )
                ).cast("bigint")
                * 1.0
            ).alias("v")
        )
    )
    w_all = Window.partitionBy()
    frame = daily
    outs = []
    for r in range(1, ESD_ROUNDS + 1):
        n = F.count(F.lit(1)).over(w_all)
        sv = F.sum("v").over(w_all)
        svv = F.sum(F.col("v") * F.col("v")).over(w_all)
        st = frame.select(
            "d",
            "v",
            (F.col("v") - sv / n).alias("dev"),
            F.sqrt(
                (n * svv - sv * sv) / ((n * 1.0) * (n - 1))
            ).alias("sd"),
        )
        rk = st.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.abs(F.col("dev")).desc(), F.col("d"))
            ),
        )
        rk = rk.persist()
        outs.append(
            rk.where(F.col("rk") == 1).select(
                F.lit(r).cast("int").alias("round"),
                F.date_format("d", "yyyy-MM-dd").alias("removed_day"),
                round_eps(F.abs(F.col("dev")) / F.col("sd"), 6).alias(
                    "g_stat"
                ),
            )
        )
        frame = rk.where(F.col("rk") > 1).select("d", "v")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("round")


# ---------------------------------------------------------------- C178

ZM_BETAS = (0.0, 1.0, 2.0, 5.0, 10.0)
ZM_TOP = 200  # fit over the top-200 ranks


def _c178_beta_cte(beta: float) -> str:
    return f"""
  SELECT {beta!r} AS beta, ln(rk + {beta!r}) AS x, ln(c * 1.0) AS y
  FROM ranked WHERE rk <= {ZM_TOP}"""


_C178_ORACLE = f"""
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY tok
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rk FROM tf
),
pts AS ({" UNION ALL ".join(_c178_beta_cte(b) for b in ZM_BETAS)}),
fits AS (
  SELECT beta,
         CAST(COUNT(*) AS BIGINT) AS n,
         (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
           / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS slope,
         (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
           * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
           / ((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
              * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))) AS r2
  FROM pts GROUP BY beta
)
SELECT beta, n AS n_ranks,
       {sql_round('-slope', 6)} AS zm_exponent,
       {sql_round('r2', 6)} AS r_squared,
       CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY r2 DESC, beta) = 1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM fits ORDER BY beta
"""


@register("zipf_mandelbrot_grid", oracle=_C178_ORACLE)
def zipf_mandelbrot_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-Mandelbrot fit by deterministic grid search over the
    rank offset beta in {ZM_BETAS}: f ~ (rank + beta)^-s fit as OLS
    on logs over the top-{ZM_TOP} ranks, reporting each beta's
    exponent and R^2 with the argmax flagged. Plain Zipf (beta = 0,
    C126) systematically misfits the HEAD of natural vocabularies;
    the offset that restores linearity is itself a corpus signature
    (synthetic/template corpora tend to beta ~ 0).

    Scale shape: one token aggregate, one vocabulary-grain rank; the
    grid is |betas| x {ZM_TOP} dimension-scale rows; each fit is a
    sufficient-statistics reduction — no iteration, no optimizer.
    """
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = tf.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("rk"),
    ).where(F.col("rk") <= ZM_TOP)
    ranked = ranked.persist()
    frames = []
    for beta in ZM_BETAS:
        frames.append(
            ranked.select(
                F.lit(beta).alias("beta"),
                F.log(F.col("rk") + beta).alias("x"),
                F.log(F.col("c") * 1.0).alias("y"),
            )
        )
    pts = frames[0]
    for fr in frames[1:]:
        pts = pts.unionAll(fr)
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    sxy = F.sum(F.col("x") * F.col("y"))
    syy = F.sum(F.col("y") * F.col("y"))
    fits = pts.groupBy("beta").agg(
        n.cast("bigint").alias("n"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("slope"),
        (
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )
    out = fits.withColumn(
        "bestrk",
        F.row_number().over(Window.orderBy(F.col("r2").desc(), F.col("beta"))),
    )
    return out.select(
        "beta",
        F.col("n").alias("n_ranks"),
        round_eps(-F.col("slope"), 6).alias("zm_exponent"),
        round_eps(F.col("r2"), 6).alias("r_squared"),
        F.when(F.col("bestrk") == 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    ).orderBy("beta")
