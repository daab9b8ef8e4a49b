"""Hundred-twenty-third sweep (SURVEY.md §2 B231-B232, C201).

Fligner-Killeen k-sample scale test (the rank-based dispersion screen
that is robust where Bartlett collapses — first consumer of the new
Acklam Phi^-1 beyond B230), Anderson-Darling normality with the
tail-weighted EDF statistic (PPCC correlates the Q-Q line, JB checks
two moments; AD integrates the WHOLE CDF gap with 1/(F(1-F)) weight —
the most tail-sensitive member of the trio), and a from-scratch
HyperLogLog with explicit registers audited against the exact
distinct count (approx_distinct_users trusts Spark's native HLL; this
one builds the registers as visible rows so both engines hold the
IDENTICAL sketch, then prices the raw and small-range-corrected
estimates against truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import (
    normal_cdf,
    normal_ppf,
    sql_normal_cdf,
    sql_normal_ppf,
)
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B231

_B231_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
med AS (
  SELECT g, CAST(ROUND(2 * median(x) + 1e-9) AS BIGINT) AS med2
  FROM samp GROUP BY g
),
centred AS (
  SELECT s.g, ABS(2 * s.x - m.med2) AS d
  FROM samp s JOIN med m USING (g)
),
gv AS (
  SELECT g, d, CAST(COUNT(*) AS BIGINT) AS cnt_gd
  FROM centred GROUP BY g, d
),
vv AS (
  SELECT d, CAST(SUM(cnt_gd) AS BIGINT) AS cnt
  FROM gv GROUP BY d
),
ladder AS (
  SELECT d,
         2 * SUM(cnt) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS rank2,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM vv
),
scored AS (
  SELECT d,
         {sql_normal_ppf('0.5 + rank2 / (4.0 * (n + 1))')} AS a,
         n
  FROM ladder
),
per_g AS (
  SELECT g, CAST(SUM(cnt_gd) AS BIGINT) AS n_g,
         SUM(cnt_gd * s.a) AS sa_g,
         SUM(cnt_gd * s.a * s.a) AS saa_g
  FROM gv JOIN scored s USING (d)
  GROUP BY g
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         SUM(sa_g) AS sa, SUM(saa_g) AS saa,
         SUM(sa_g * sa_g / n_g) AS sgg
  FROM per_g
)
SELECT k, n, CAST(k - 1 AS BIGINT) AS df,
       {sql_round('(sgg - sa * sa / n)'
                  ' / ((saa - sa * sa / n) / (n - 1.0))', 6)} AS fk_stat,
       {sql_round(
           'exp(-((sgg - sa * sa / n)'
           '      / ((saa - sa * sa / n) / (n - 1.0))) / 2)'
           ' * (1.0 + ((sgg - sa * sa / n)'
           '           / ((saa - sa * sa / n) / (n - 1.0))) / 2)', 6)}
         AS p_value_df4,
       CASE WHEN (sgg - sa * sa / n)
                 / ((saa - sa * sa / n) / (n - 1.0)) > 9.487729
            THEN 1 ELSE 0 END AS heteroscedastic_5pct
FROM tot
"""


@register("fligner_killeen", oracle=_B231_ORACLE)
def fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen test that order-value DISPERSION is equal
    across the five priorities: centre each group at its exact
    median, pool-rank the absolute deviations, map average ranks
    through the Acklam Phi^-1 to normal scores, and chi-square the
    between-group spread of mean scores. Brown-Forsythe (B-track)
    answers the same question with means of |x - med|; FK is the
    rank version that survives arbitrary heavy tails — the pairing
    shows WHEN the parametric shortcut is safe. df = k-1 = 4, so the
    p-value has the exact even-df closed form e^{-x/2}(1 + x/2).

    Exactness: cents are exact integers; doubled medians (2*median
    of an integer column is always integral) and doubled average
    ranks stay integers through the shuffle, so both engines feed
    IDENTICAL rationals into the shared Phi^-1 polynomial.

    Scale shape: one fact pass to (group, deviation-value) grain,
    a |distinct values| ladder window, two small reductions — the
    kruskal_wallis recipe with a normal-scores head.

    Reference semantics: the dispersion screens in
    ojd_daps/flows/examples weekly QA (means/medians per slice).
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("x"),
    )
    med = samp.groupBy("g").agg(
        F.round(2 * F.expr("percentile(x, 0.5)") + 1e-9)
        .cast("bigint")
        .alias("med2")
    )
    centred = samp.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("x") - F.col("med2")).alias("d")
    )
    gv = centred.groupBy("g", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_gd")
    )
    vv = gv.groupBy("d").agg(F.sum("cnt_gd").cast("bigint").alias("cnt"))
    w_cum = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ladder = vv.select(
        "d",
        (2 * F.sum("cnt").over(w_cum) - F.col("cnt") + 1).alias("rank2"),
        F.sum("cnt").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    scored = ladder.select(
        "d",
        normal_ppf(0.5 + F.col("rank2") / (4.0 * (F.col("n") + 1))).alias(
            "a"
        ),
    )
    per_g = (
        gv.join(scored, "d")
        .groupBy("g")
        .agg(
            F.sum("cnt_gd").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt_gd") * F.col("a")).alias("sa_g"),
            F.sum(F.col("cnt_gd") * F.col("a") * F.col("a")).alias("saa_g"),
        )
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("sa_g").alias("sa"),
        F.sum("saa_g").alias("saa"),
        F.sum(F.col("sa_g") * F.col("sa_g") / F.col("n_g")).alias("sgg"),
    )
    stat = (F.col("sgg") - F.col("sa") * F.col("sa") / F.col("n")) / (
        (F.col("saa") - F.col("sa") * F.col("sa") / F.col("n"))
        / (F.col("n") - 1.0)
    )
    return tot.select(
        "k",
        "n",
        (F.col("k") - 1).cast("bigint").alias("df"),
        round_eps(stat, 6).alias("fk_stat"),
        round_eps(F.exp(-stat / 2) * (1.0 + stat / 2), 6).alias(
            "p_value_df4"
        ),
        (stat > 9.487729).cast("int").alias("heteroscedastic_5pct"),
    )


# ---------------------------------------------------------------- B232

AD_CRIT_5PCT = 0.752  # Stephens (1974), case 3 (both params estimated)

_B232_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM weekly_src GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM weekly
),
z AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY y, w) AS BIGINT) AS i,
         m.n,
         (y - CAST(m.sy AS DOUBLE) / m.n)
           / sqrt((m.syy - CAST(m.sy AS DOUBLE) * m.sy / m.n)
                  / (m.n - 1.0)) AS zi
  FROM weekly, mom m
),
terms AS (
  SELECT n,
         SUM((2 * i - 1) * ln({sql_normal_cdf('zi')})
             + (2 * (n - i) + 1) * ln(1.0 - {sql_normal_cdf('zi')}))
           AS s
  FROM z GROUP BY n
)
SELECT n AS n_weeks,
       {sql_round('-CAST(n AS DOUBLE) - s / n', 6)} AS a2,
       {sql_round('(-CAST(n AS DOUBLE) - s / n)'
                  ' * (1.0 + 0.75 / n + 2.25 / (n * CAST(n AS DOUBLE)))',
                  6)} AS a2_star,
       {AD_CRIT_5PCT!r} AS crit_5pct,
       CASE WHEN (-CAST(n AS DOUBLE) - s / n)
                 * (1.0 + 0.75 / n + 2.25 / (n * CAST(n AS DOUBLE)))
                 > {AD_CRIT_5PCT!r}
            THEN 1 ELSE 0 END AS reject_normal_5pct
FROM terms
"""

_B232_SQL = _B232_ORACLE.replace("weekly_src", "orders")


@register("anderson_darling", oracle=_B232_SQL)
def anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling normality test on weekly order volume —
    the tail-weighted completion of the normality trio: B125's
    Jarque-Bera checks two moments, B230's PPCC correlates the Q-Q
    line, AD integrates the squared CDF gap with weight 1/(F(1-F))
    so a single bad TAIL point moves it the way it moves a risk
    monitor. Uses the symmetric single-pass identity
    A2 = -n - (1/n) SUM_i [(2i-1) ln Phi(z_i) + (2(n-i)+1)
    ln(1-Phi(z_i))] so each sorted row contributes once (no reversed
    self-join); tied values contribute permutation-invariantly
    because coefficient sums over a tied block are fixed. Reports
    Stephens' small-sample A2* against the estimated-parameters 5%
    point 0.752.

    Exactness: rank window deterministic (value-then-week), moments
    exact integers, Phi is the shared A&S polynomial — identical
    double trees end-to-end.

    Scale shape: one fact aggregate, one |weeks| sort window, one
    reduction.
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
    dec = "decimal(38,0)"
    mom = weekly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast("double").alias("syy"),
    )
    z = attach_scalars(weekly, mom).select(
        F.row_number()
        .over(Window.orderBy("y", "w"))
        .cast("bigint")
        .alias("i"),
        "n",
        (
            (F.col("y") - F.col("sy").cast("double") / F.col("n"))
            / F.sqrt(
                (
                    F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy") / F.col("n")
                )
                / (F.col("n") - 1.0)
            )
        ).alias("zi"),
    )
    phi = normal_cdf(F.col("zi"))
    terms = z.groupBy("n").agg(
        F.sum(
            (2 * F.col("i") - 1) * F.log(phi)
            + (2 * (F.col("n") - F.col("i")) + 1) * F.log(1.0 - phi)
        ).alias("s")
    )
    a2 = -F.col("n").cast("double") - F.col("s") / F.col("n")
    a2s = a2 * (
        1.0
        + 0.75 / F.col("n")
        + 2.25 / (F.col("n") * F.col("n").cast("double"))
    )
    return terms.select(
        F.col("n").alias("n_weeks"),
        round_eps(a2, 6).alias("a2"),
        round_eps(a2s, 6).alias("a2_star"),
        F.lit(AD_CRIT_5PCT).alias("crit_5pct"),
        (a2s > AD_CRIT_5PCT).cast("int").alias("reject_normal_5pct"),
    )


# ---------------------------------------------------------------- C201

HLL_B = 8  # register-index bits
HLL_M = 1 << HLL_B  # 256 registers
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_W_BITS = 53  # 60-bit md5 hash minus 8 bucket bits, +1 rank headroom

_C201_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT {sql_hash64("CAST(event_id AS VARCHAR)")} AS h
  FROM events
),
reg AS (
  SELECT CAST(h % {HLL_M} AS BIGINT) AS bucket,
         CAST(MAX(CASE WHEN h // {HLL_M} = 0 THEN {_W_BITS}
                       ELSE {_W_BITS} - length(bin(h // {HLL_M}))
                  END) AS BIGINT) AS m
  FROM hashed GROUP BY 1
),
sketch AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS present,
         CAST(SUM(CAST(pow(2, {_W_BITS} - m) AS HUGEINT))
              + ({HLL_M} - COUNT(*))
                * CAST(pow(2, {_W_BITS}) AS HUGEINT) AS DOUBLE) AS s,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS zeros
  FROM reg
),
est AS (
  SELECT present, zeros,
         {HLL_ALPHA * HLL_M * HLL_M * float(2 ** _W_BITS)!r} / s AS raw,
         (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) FROM events)
           AS exact
  FROM sketch
)
SELECT present AS registers_set, zeros AS registers_zero,
       {sql_round('raw', 4)} AS hll_raw,
       {sql_round(
           f'CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0'
           f' THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / zeros)'
           ' ELSE raw END', 4)} AS hll_estimate,
       exact AS exact_distinct,
       {sql_round(
           f'ABS(CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0'
           f' THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / zeros)'
           ' ELSE raw END - exact) * 100.0 / exact', 4)} AS abs_rel_err_pct
FROM est
"""


@register("hll_from_scratch", oracle=_C201_ORACLE)
def hll_from_scratch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from explicit registers — the cardinality
    sketch as VISIBLE rows rather than a native opaque binary
    (approx_distinct_users trusts Spark's HLL++; this one lets both
    engines construct the IDENTICAL 256-register sketch from the
    shared md5 hash64, so the estimate itself is hash-matched, not
    tolerance-matched). Register j keeps the max leading-zero rank
    of the 52-bit suffix routed to it; the harmonic mean is priced
    as SUM 2^(53-M_j) in EXACT 128-bit integers (every term a power
    of two, so no float-order ambiguity crossing engines), then
    Flajolet's small-range correction m*ln(m/V) kicks in when the
    raw estimate dips under 2.5m with empty registers. Output
    includes the exact distinct count and the realised error — the
    sketch audited against truth, like minhash_jaccard_vs_exact.

    Exactness: the register table is deterministic integers; the
    only doubles are two divisions and one ln on identical inputs.

    Scale shape: map-side hash + one 256-group aggregate;
    merge-ability of registers (MAX) is the whole point at 100 TB —
    per-partition sketches combine losslessly.
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        hash64(F.col("event_id").cast("string")).alias("h")
    ).distinct()
    w = F.expr(f"h DIV {HLL_M}")
    reg = hashed.groupBy((F.col("h") % HLL_M).cast("bigint").alias("bucket")).agg(
        F.max(
            F.when(w == 0, F.lit(_W_BITS)).otherwise(
                _W_BITS - F.length(F.bin(w))
            )
        )
        .cast("bigint")
        .alias("m")
    )
    dec = "decimal(38,0)"
    sketch = reg.agg(
        F.count(F.lit(1)).cast("bigint").alias("present"),
        (
            F.sum(F.pow(F.lit(2.0), _W_BITS - F.col("m")).cast(dec))
            + (HLL_M - F.count(F.lit(1))).cast(dec)
            * F.lit(float(2**_W_BITS)).cast(dec)
        )
        .cast("double")
        .alias("s"),
        (HLL_M - F.count(F.lit(1))).cast("bigint").alias("zeros"),
    )
    exact = ev.agg(
        F.countDistinct("event_id").cast("bigint").alias("exact")
    )
    est = attach_scalars(sketch, exact).select(
        "present",
        "zeros",
        (
            F.lit(HLL_ALPHA * HLL_M * HLL_M * float(2**_W_BITS)) / F.col("s")
        ).alias("raw"),
        "exact",
    )
    corrected = F.when(
        (F.col("raw") <= 2.5 * HLL_M) & (F.col("zeros") > 0),
        HLL_M * F.log(float(HLL_M) / F.col("zeros")),
    ).otherwise(F.col("raw"))
    return est.select(
        F.col("present").alias("registers_set"),
        F.col("zeros").alias("registers_zero"),
        round_eps(F.col("raw"), 4).alias("hll_raw"),
        round_eps(corrected, 4).alias("hll_estimate"),
        F.col("exact").alias("exact_distinct"),
        round_eps(
            F.abs(corrected - F.col("exact")) * 100.0 / F.col("exact"), 4
        ).alias("abs_rel_err_pct"),
    )
