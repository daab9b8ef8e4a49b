"""Hundred-twenty-sixth sweep (SURVEY.md §2 B236-B237, C205-C206).

Getis-Ord Gi* local hotspot z-scores over the geo grid (B234's
Moran's I says value clusters SOMEWHERE; Gi* says WHERE — the
local/global pairing of spatial statistics), Bartlett's normal-theory
variance-equality test beside B231's Fligner-Killeen (the textbook
fragile/robust pairing: when the two disagree, non-normality — not
heteroscedasticity — is driving Bartlett), Cochran's Q that the three
document quality gates fire at DIFFERENT marginal rates, and Fleiss'
kappa that the same three gates AGREE beyond chance — marginal
homogeneity and agreement are different questions on the identical
doc x gate binary table, and the pair completes filter_venn_overlap's
set-accounting with inference.
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

# ---------------------------------------------------------------- B236

GO_CELL_DEG = 0.5
GO_TOP = 10

_B236_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(c_acctbal * 100 + 1e-9) AS BIGINT) AS bal_c,
         CAST(FLOOR((50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))
                             ::BIGINT % 5000) / 1000.0)
                    / {GO_CELL_DEG!r}) AS BIGINT) AS ci,
         CAST(FLOOR((-5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))
                             ::BIGINT % 10000) / 1000.0)
                    / {GO_CELL_DEG!r}) AS BIGINT) AS cj
  FROM customer
),
xs AS (
  SELECT ci, cj, CAST(SUM(bal_c) AS DOUBLE) / COUNT(*) / 100.0 AS x
  FROM pts GROUP BY ci, cj
),
gstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) / COUNT(*) AS xbar,
         sqrt(SUM(x * x) / COUNT(*)
              - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*))) AS s
  FROM xs
),
nbr AS (
  SELECT a.ci, a.cj,
         SUM(b.x) AS wx,
         CAST(COUNT(*) AS BIGINT) AS wi
  FROM xs a JOIN xs b
    ON ABS(a.ci - b.ci) <= 1 AND ABS(a.cj - b.cj) <= 1
  GROUP BY a.ci, a.cj
),
scored AS (
  SELECT ci, cj, wi,
         (wx - g.xbar * wi)
           / (g.s * sqrt((CAST(g.n AS DOUBLE) * wi - CAST(wi AS DOUBLE) * wi)
                         / (g.n - 1.0))) AS z
  FROM nbr, gstats g
),
ranked AS (
  SELECT ci, cj, wi, z,
         ROW_NUMBER() OVER (ORDER BY z DESC, ci, cj) AS rk
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rank, ci, cj, wi AS neighbourhood_size,
       {sql_round('z', 6)} AS gi_star_z,
       {sql_round('2 * ' + sql_normal_sf_abs('z'), 6)} AS p_two_sided,
       CASE WHEN z > 1.959964 THEN 1 ELSE 0 END AS hotspot_5pct
FROM ranked
WHERE rk <= {GO_TOP}
ORDER BY rank
"""


@register("getis_ord_hotspots", oracle=_B236_ORACLE)
def getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot detection on the geo grid: for each
    cell, z-score the SUM of mean balances over its queen+self (3x3)
    neighbourhood against what a random placement would give —
    B234's Moran's I is the global 'does value cluster?' scalar,
    Gi* is the map that says WHERE (the top-{GO_TOP} hottest cells
    here). Uses the standard Gi* variance with binary weights
    (self included), population sd, and the two-sided normal p.

    Exactness: cell means divide exact integer cent sums; the 3x3
    neighbourhood join is integer-keyed; z is one double tree.

    Scale shape: points collapse to cells map-side; the
    neighbourhood join is a self-join of the |cells| frame on 9
    offsets (never the point cloud); one global 1-row broadcast.

    Reference: the observatory's regional tiles — this is the
    'which regions are genuinely hot' statistic under them.
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
        F.floor((50.0 + _frac("g", 5000) / 1000.0) / GO_CELL_DEG)
        .cast("bigint")
        .alias("ci"),
        F.floor((-5.0 + _frac("h", 10000) / 1000.0) / GO_CELL_DEG)
        .cast("bigint")
        .alias("cj"),
    )
    xs = pts.groupBy("ci", "cj").agg(
        (F.sum("bal_c").cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "x"
        )
    )
    xs = xs.persist()
    glob = xs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("x") / F.count(F.lit(1))).alias("xbar"),
        F.sqrt(
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("s"),
    )
    # Queen+self neighbourhood via the 9 OFFSET KEYS: explode each
    # cell into its (ci+di, cj+dj) probes and equi-join back to the
    # broadcast cell frame on (ci, cj) — hash join, not a non-equi
    # nested loop over |cells|^2.
    offsets = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    ])
    probes = xs.select(
        "ci", "cj", F.explode(offsets).alias("o")
    ).select(
        "ci",
        "cj",
        (F.col("ci") + F.col("o.di")).alias("nci"),
        (F.col("cj") + F.col("o.dj")).alias("ncj"),
    )
    nbr = (
        probes.join(
            F.broadcast(
                xs.select(
                    F.col("ci").alias("nci"),
                    F.col("cj").alias("ncj"),
                    F.col("x").alias("bx"),
                )
            ),
            ["nci", "ncj"],
        )
        .groupBy("ci", "cj")
        .agg(
            F.sum(F.col("bx")).alias("wx"),
            F.count(F.lit(1)).cast("bigint").alias("wi"),
        )
    )
    scored = attach_scalars(nbr, glob).select(
        "ci",
        "cj",
        "wi",
        (
            (F.col("wx") - F.col("xbar") * F.col("wi"))
            / (
                F.col("s")
                * F.sqrt(
                    (
                        F.col("n").cast("double") * F.col("wi")
                        - F.col("wi").cast("double") * F.col("wi")
                    )
                    / (F.col("n") - 1.0)
                )
            )
        ).alias("z"),
    )
    ranked = scored.select(
        F.row_number()
        .over(Window.orderBy(F.col("z").desc(), "ci", "cj"))
        .cast("bigint")
        .alias("rank"),
        "ci",
        "cj",
        F.col("wi").alias("neighbourhood_size"),
        round_eps(F.col("z"), 6).alias("gi_star_z"),
        round_eps(2 * normal_sf_abs(F.col("z")), 6).alias("p_two_sided"),
        (F.col("z") > 1.959964).cast("int").alias("hotspot_5pct"),
    )
    return ranked.where(F.col("rank") <= GO_TOP).orderBy("rank")


# ---------------------------------------------------------------- B237

_B237_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
per_g AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
  FROM samp GROUP BY g
),
vars_ AS (
  SELECT g, ng,
         (sxx - CAST(sx AS DOUBLE) * sx / ng) / (ng - 1.0) AS s2
  FROM per_g
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         SUM((ng - 1.0) * s2) AS pooled_num,
         SUM((ng - 1.0) * ln(s2)) AS sum_ln,
         SUM(1.0 / (ng - 1.0)) AS sum_inv
  FROM vars_
),
stat AS (
  SELECT k, n,
         ((n - CAST(k AS DOUBLE)) * ln(pooled_num / (n - k)) - sum_ln)
           / (1.0 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1)))
           AS t_stat
  FROM tot
)
SELECT k, n, CAST(k - 1 AS BIGINT) AS df,
       {sql_round('t_stat', 6)} AS bartlett_stat,
       {sql_round('exp(-t_stat / 2) * (1.0 + t_stat / 2)', 6)}
         AS p_value_df4,
       CASE WHEN t_stat > 9.487729 THEN 1 ELSE 0 END
         AS heteroscedastic_5pct
FROM stat
"""


@register("bartlett_test", oracle=_B237_ORACLE)
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's normal-theory variance-equality test across the
    five priorities — deliberately published BESIDE B231's
    Fligner-Killeen on the identical cents sample: Bartlett is the
    most powerful k-sample variance test WHEN the data are normal
    and wildly anti-conservative when they are not (its statistic
    loads on kurtosis), so FK-vs-Bartlett disagreement is itself a
    diagnostic — it means the tails, not the variances, differ.
    Same closed-form even-df chi-square p as FK (df = 4).

    Exactness: per-group moments are exact 128-bit integers; the
    variances, logs and the correction factor C are identical
    double trees in both engines.

    Scale shape: ONE map-side-combinable fact aggregate to 5 rows,
    one reduction — the cheapest test in the scale family.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("x"),
    )
    dec = "decimal(38,0)"
    per_g = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("sxx"),
    )
    s2 = (
        F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx") / F.col("ng")
    ) / (F.col("ng") - 1.0)
    vars_ = per_g.select("g", "ng", s2.alias("s2"))
    tot = vars_.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum((F.col("ng") - 1.0) * F.col("s2")).alias("pooled_num"),
        F.sum((F.col("ng") - 1.0) * F.log(F.col("s2"))).alias("sum_ln"),
        F.sum(1.0 / (F.col("ng") - 1.0)).alias("sum_inv"),
    )
    t_stat = (
        (F.col("n") - F.col("k").cast("double"))
        * F.log(F.col("pooled_num") / (F.col("n") - F.col("k")))
        - F.col("sum_ln")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / (F.col("n") - F.col("k")))
        / (3.0 * (F.col("k") - 1))
    )
    return tot.select(
        "k",
        "n",
        (F.col("k") - 1).cast("bigint").alias("df"),
        round_eps(t_stat, 6).alias("bartlett_stat"),
        round_eps(F.exp(-t_stat / 2) * (1.0 + t_stat / 2), 6).alias(
            "p_value_df4"
        ),
        (t_stat > 9.487729).cast("int").alias("heteroscedastic_5pct"),
    )


# ---------------------------------------------------------------- C205/C206 shared gate table

FV_LEN_MIN = 25
FV_REP_MAX = 0.12
FV_TTR_MIN = 0.40

_GATES_CTE = f"""
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
per_tok AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, tok
),
flagged AS (
  SELECT doc_id,
         CASE WHEN SUM(c) < {FV_LEN_MIN} THEN 1 ELSE 0 END AS f1,
         CASE WHEN MAX(c) * 1.0 / SUM(c) > {FV_REP_MAX} THEN 1 ELSE 0 END
           AS f2,
         CASE WHEN COUNT(*) * 1.0 / SUM(c) < {FV_TTR_MIN} THEN 1 ELSE 0 END
           AS f3
  FROM per_tok GROUP BY doc_id
)"""


def _gates_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per_tok.groupBy("doc_id").agg(
        (F.sum("c") < FV_LEN_MIN).cast("int").alias("f1"),
        (F.max("c") * 1.0 / F.sum("c") > FV_REP_MAX).cast("int").alias("f2"),
        (F.count(F.lit(1)) * 1.0 / F.sum("c") < FV_TTR_MIN)
        .cast("int")
        .alias("f3"),
    )


_C205_ORACLE = f"""
WITH {_GATES_CTE},
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(f1) AS BIGINT) AS c1,
         CAST(SUM(f2) AS BIGINT) AS c2,
         CAST(SUM(f3) AS BIGINT) AS c3,
         CAST(SUM(f1 + f2 + f3) AS BIGINT) AS t,
         CAST(SUM((f1 + f2 + f3) * (f1 + f2 + f3)) AS BIGINT) AS t2
  FROM flagged
),
stat AS (
  SELECT n, c1, c2, c3,
         3.0 * 2.0 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
                      + CAST(c3 AS DOUBLE) * c3
                      - CAST(t AS DOUBLE) * t / 3.0)
           / (3.0 * t - t2) AS q
  FROM sums
)
SELECT n AS n_docs, c1 AS short_fires, c2 AS repeat_fires,
       c3 AS lowdiv_fires,
       {sql_round('q', 6)} AS cochran_q,
       CAST(2 AS BIGINT) AS df,
       {sql_round('exp(-q / 2)', 6)} AS p_value_df2,
       CASE WHEN q > 5.991465 THEN 1 ELSE 0 END AS rates_differ_5pct
FROM stat
"""


@register("cochran_q_gates", oracle=_C205_ORACLE)
def cochran_q_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the three quality gates (short /
    repetitive / low-diversity) treated as matched binary raters on
    every document: do the gates FIRE AT THE SAME MARGINAL RATE, or
    is one systematically stricter? filter_venn_overlap (C197) gives
    the 8-cell set accounting; Q is the inference on its margins —
    the k-related-samples generalisation of McNemar (B-track), and
    with df = k-1 = 2 the p-value is exactly e^(-Q/2).

    Exactness: Q's numerator and denominator are built from exact
    integer counts; one division, one exp.

    Scale shape: the (doc, token) aggregate the gate definitions
    already need, then ONE map-side-combinable reduction over docs.
    """
    flagged = _gates_frame(spark, sf_dir)
    t = F.col("f1") + F.col("f2") + F.col("f3")
    sums = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f1").cast("bigint").alias("c1"),
        F.sum("f2").cast("bigint").alias("c2"),
        F.sum("f3").cast("bigint").alias("c3"),
        F.sum(t).cast("bigint").alias("t"),
        F.sum(t * t).cast("bigint").alias("t2"),
    )
    q = (
        3.0
        * 2.0
        * (
            F.col("c1").cast("double") * F.col("c1")
            + F.col("c2").cast("double") * F.col("c2")
            + F.col("c3").cast("double") * F.col("c3")
            - F.col("t").cast("double") * F.col("t") / 3.0
        )
        / (3.0 * F.col("t") - F.col("t2"))
    )
    return sums.select(
        F.col("n").alias("n_docs"),
        F.col("c1").alias("short_fires"),
        F.col("c2").alias("repeat_fires"),
        F.col("c3").alias("lowdiv_fires"),
        round_eps(q, 6).alias("cochran_q"),
        F.lit(2).cast("bigint").alias("df"),
        round_eps(F.exp(-q / 2), 6).alias("p_value_df2"),
        (q > 5.991465).cast("int").alias("rates_differ_5pct"),
    )


_C206_ORACLE = f"""
WITH {_GATES_CTE},
rows_ AS (
  SELECT f1 + f2 + f3 AS r FROM flagged
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r) AS BIGINT) AS succ,
         CAST(SUM(r * (r - 1) + (3 - r) * (2 - r)) AS BIGINT) AS agree2
  FROM rows_
),
stat AS (
  SELECT n, succ,
         CAST(agree2 AS DOUBLE) / (n * 6.0) AS pbar,
         (CAST(succ AS DOUBLE) / (3.0 * n))
           * (CAST(succ AS DOUBLE) / (3.0 * n))
           + (1.0 - CAST(succ AS DOUBLE) / (3.0 * n))
             * (1.0 - CAST(succ AS DOUBLE) / (3.0 * n)) AS pe
  FROM sums
)
SELECT n AS n_docs, succ AS total_fires,
       {sql_round('pbar', 6)} AS observed_agreement,
       {sql_round('pe', 6)} AS chance_agreement,
       {sql_round('(pbar - pe) / (1.0 - pe)', 6)} AS fleiss_kappa,
       CASE WHEN (pbar - pe) / (1.0 - pe) > 0.6 THEN 1 ELSE 0 END
         AS substantial_agreement
FROM stat
"""


@register("fleiss_kappa_gates", oracle=_C206_ORACLE)
def fleiss_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the same three gates as C205 — the OTHER
    question on the identical doc x gate table: Cochran's Q asks
    whether marginal fire-rates differ; kappa asks whether the gates
    AGREE doc-by-doc beyond what their margins force. High kappa
    means the gates are redundant (drop one, save a pass); low kappa
    with equal margins means they kill DIFFERENT documents —
    exactly the complementarity filter_venn_overlap eyeballs, as a
    single chance-corrected scalar. Binary case with m = 3 raters:
    per-doc agreement is (r(r-1) + (3-r)(2-r))/6, an exact integer
    identity.

    Exactness: observed and chance agreement are ratios of exact
    integers; kappa is one double tree.

    Scale shape: same single reduction as C205 — the two tests
    share their shuffle when run in one job.
    """
    flagged = _gates_frame(spark, sf_dir)
    r = F.col("f1") + F.col("f2") + F.col("f3")
    sums = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(r).cast("bigint").alias("succ"),
        F.sum(r * (r - 1) + (3 - r) * (2 - r)).cast("bigint").alias(
            "agree2"
        ),
    )
    pbar = F.col("agree2").cast("double") / (F.col("n") * 6.0)
    p1 = F.col("succ").cast("double") / (3.0 * F.col("n"))
    pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    kappa = (pbar - pe) / (1.0 - pe)
    return sums.select(
        F.col("n").alias("n_docs"),
        F.col("succ").alias("total_fires"),
        round_eps(pbar, 6).alias("observed_agreement"),
        round_eps(pe, 6).alias("chance_agreement"),
        round_eps(kappa, 6).alias("fleiss_kappa"),
        (kappa > 0.6).cast("int").alias("substantial_agreement"),
    )
