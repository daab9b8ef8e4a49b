"""Hundred-thirty-second sweep (SURVEY.md §2 B244-B245, C216).

Hoeffding's D independence test between weekly volume and weekly
revenue (Spearman/Kendall see only MONOTONE dependence; D sees any
dependence at all — the nonparametric closure of the correlation
family), partial correlations of the weekly (volume, revenue,
customers) triple (which pairwise correlations survive controlling
for the third — the one-step graphical-model screen over
correlation_matrix's raw numbers), and a shingle-size sensitivity
sweep (every dedup threshold in the C-track is conditional on the
shingle order k; this prints how type counts, duplicate mass and
top-shingle concentration move as k goes 1..5 — the chart that
justifies the pipelines' k choices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B244

_WEEKLY2 = """
weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
)"""

_B244_ORACLE = f"""
WITH {_WEEKLY2},
rx AS (
  SELECT w, x, y,
         2 * (SELECT COUNT(*) FROM weekly b WHERE b.x < a.x)
           + (SELECT COUNT(*) FROM weekly b WHERE b.x = a.x) + 1 AS r2,
         2 * (SELECT COUNT(*) FROM weekly b WHERE b.y < a.y)
           + (SELECT COUNT(*) FROM weekly b WHERE b.y = a.y) + 1 AS s2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM weekly b
          WHERE b.x < a.x AND b.y < a.y) AS c
  FROM weekly a
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS DOUBLE) AS d1,
         SUM((r2 / 2.0 - 1) * (r2 / 2.0 - 2)
             * (s2 / 2.0 - 1) * (s2 / 2.0 - 2)) AS d2,
         SUM((r2 / 2.0 - 2) * (s2 / 2.0 - 2) * c) AS d3
  FROM rx
)
SELECT n AS n_weeks,
       {sql_round('d1', 1)} AS d1,
       {sql_round('d2', 1)} AS d2,
       {sql_round('d3', 1)} AS d3,
       {sql_round(
           '30.0 * ((n - 2.0) * (n - 3) * d1 + d2 - 2 * (n - 2.0) * d3)'
           ' / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)'
           '    * (n - 3) * (n - 4))', 8)} AS hoeffding_d,
       CASE WHEN 30.0 * ((n - 2.0) * (n - 3) * d1 + d2
                         - 2 * (n - 2.0) * d3)
                 / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)
                    * (n - 3) * (n - 4)) > 0
            THEN 1 ELSE 0 END AS dependent_sign
FROM sums
"""


@register("hoeffdings_d", oracle=_B244_ORACLE)
def hoeffdings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D between weekly order count and weekly revenue —
    the dependence test that needs NO shape assumption: Spearman
    (B-track) and Kendall see only monotone association; D integrates
    the squared gap between the joint rank CDF and the product of
    margins, so a U-shaped or cyclic relationship that zeroes the
    rank correlations still lights it up. Midranks for ties, strict
    double-inferior counts c_i, and the classical
    D = 30[(n-2)(n-3)D1 + D2 - 2(n-2)D3] / n(n-1)(n-2)(n-3)(n-4).

    Exactness: doubled midranks and the c_i counts are exact
    integers off one bounded pair join; D is a single double tree.

    Scale shape: the |weeks| series self-joins once for the
    bivariate inferior counts (series-sized, not corpus-sized);
    everything else is one reduction.
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
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    weekly = weekly.persist()
    a = weekly.alias("a")
    b = weekly.alias("b")
    pair_stats = (
        a.join(b, F.col("a.w") != F.col("b.w"))
        .groupBy(F.col("a.w").alias("w"))
        .agg(
            F.sum((F.col("b.x") < F.col("a.x")).cast("int"))
            .cast("bigint")
            .alias("xlt"),
            F.sum((F.col("b.x") == F.col("a.x")).cast("int"))
            .cast("bigint")
            .alias("xeq"),
            F.sum((F.col("b.y") < F.col("a.y")).cast("int"))
            .cast("bigint")
            .alias("ylt"),
            F.sum((F.col("b.y") == F.col("a.y")).cast("int"))
            .cast("bigint")
            .alias("yeq"),
            F.sum(
                (
                    (F.col("b.x") < F.col("a.x"))
                    & (F.col("b.y") < F.col("a.y"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    # the oracle's equality counts include the self row (b = a), the
    # w != w join here excludes it — add it back (+1 inside, so +2).
    rx = pair_stats.select(
        (2 * F.col("xlt") + F.col("xeq") + 2).alias("r2"),
        (2 * F.col("ylt") + F.col("yeq") + 2).alias("s2"),
        "c",
    )
    sums = rx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("double").alias("d1"),
        F.sum(
            (F.col("r2") / 2.0 - 1)
            * (F.col("r2") / 2.0 - 2)
            * (F.col("s2") / 2.0 - 1)
            * (F.col("s2") / 2.0 - 2)
        ).alias("d2"),
        F.sum(
            (F.col("r2") / 2.0 - 2) * (F.col("s2") / 2.0 - 2) * F.col("c")
        ).alias("d3"),
    )
    nd = F.col("n").cast("double")
    d = (
        30.0
        * (
            (F.col("n") - 2.0) * (F.col("n") - 3) * F.col("d1")
            + F.col("d2")
            - 2 * (F.col("n") - 2.0) * F.col("d3")
        )
        / (
            nd
            * (F.col("n") - 1)
            * (F.col("n") - 2)
            * (F.col("n") - 3)
            * (F.col("n") - 4)
        )
    )
    return sums.select(
        F.col("n").alias("n_weeks"),
        round_eps(F.col("d1"), 1).alias("d1"),
        round_eps(F.col("d2"), 1).alias("d2"),
        round_eps(F.col("d3"), 1).alias("d3"),
        round_eps(d, 8).alias("hoeffding_d"),
        (d > 0).cast("int").alias("dependent_sign"),
    )


# ---------------------------------------------------------------- B245

_B245_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS a,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS b,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS saa,
         CAST(SUM(CAST(b AS HUGEINT) * b) AS DOUBLE) AS sbb,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS scc,
         CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sab,
         CAST(SUM(CAST(a AS HUGEINT) * c) AS DOUBLE) AS sac,
         CAST(SUM(CAST(b AS HUGEINT) * c) AS DOUBLE) AS sbc
  FROM weekly
),
rr AS (
  SELECT n,
         (n * sab - CAST(sa AS DOUBLE) * sb)
           / sqrt((n * saa - CAST(sa AS DOUBLE) * sa)
                  * (n * sbb - CAST(sb AS DOUBLE) * sb)) AS rab,
         (n * sac - CAST(sa AS DOUBLE) * sc)
           / sqrt((n * saa - CAST(sa AS DOUBLE) * sa)
                  * (n * scc - CAST(sc AS DOUBLE) * sc)) AS rac,
         (n * sbc - CAST(sb AS DOUBLE) * sc)
           / sqrt((n * sbb - CAST(sb AS DOUBLE) * sb)
                  * (n * scc - CAST(sc AS DOUBLE) * sc)) AS rbc
  FROM mom
)
SELECT pair, n AS n_weeks,
       {sql_round('raw_r', 6)} AS raw_r,
       {sql_round('partial_r', 6)} AS partial_r,
       {sql_round('raw_r - partial_r', 6)} AS confound_shift
FROM (
  SELECT n, 'volume~revenue | customers' AS pair, rab AS raw_r,
         (rab - rac * rbc) / sqrt((1 - rac * rac) * (1 - rbc * rbc))
           AS partial_r
  FROM rr
  UNION ALL
  SELECT n, 'volume~customers | revenue', rac,
         (rac - rab * rbc) / sqrt((1 - rab * rab) * (1 - rbc * rbc))
  FROM rr
  UNION ALL
  SELECT n, 'revenue~customers | volume', rbc,
         (rbc - rab * rac) / sqrt((1 - rab * rab) * (1 - rac * rac))
  FROM rr
)
ORDER BY pair
"""


@register("partial_correlation", oracle=_B245_ORACLE)
def partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlations of the weekly (volume,
    revenue, distinct customers) triple: for each pair, what remains
    after controlling the third — correlation_matrix (B-track) gives
    raw pairwise numbers, this is the one-step graphical-model
    screen over them: raw_r large but partial_r near zero means the
    pair is connected only THROUGH the control (the classic
    volume~revenue confound through customer count), and
    confound_shift prices it.

    Exactness: all nine moments are exact 128-bit integers from one
    aggregate; the three raw and three partial correlations are
    identical double trees.

    Scale shape: ONE map-side-combinable fact aggregate to |weeks|,
    one 1-row reduction, three output rows by construction.
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
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("a"),
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("b"),
            F.countDistinct("o_custkey").cast("bigint").alias("c"),
        )
    )
    dec = "decimal(38,0)"
    mom = weekly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("a").cast(dec) * F.col("a")).cast("double").alias("saa"),
        F.sum(F.col("b").cast(dec) * F.col("b")).cast("double").alias("sbb"),
        F.sum(F.col("c").cast(dec) * F.col("c")).cast("double").alias("scc"),
        F.sum(F.col("a").cast(dec) * F.col("b")).cast("double").alias("sab"),
        F.sum(F.col("a").cast(dec) * F.col("c")).cast("double").alias("sac"),
        F.sum(F.col("b").cast(dec) * F.col("c")).cast("double").alias("sbc"),
    )
    nd = F.col("n").cast("double")

    def _r(sxy, sx, sy, sxx, syy):
        return (nd * F.col(sxy) - F.col(sx).cast("double") * F.col(sy)) / (
            F.sqrt(
                (nd * F.col(sxx) - F.col(sx).cast("double") * F.col(sx))
                * (nd * F.col(syy) - F.col(sy).cast("double") * F.col(sy))
            )
        )

    rr = mom.select(
        "n",
        _r("sab", "sa", "sb", "saa", "sbb").alias("rab"),
        _r("sac", "sa", "sc", "saa", "scc").alias("rac"),
        _r("sbc", "sb", "sc", "sbb", "scc").alias("rbc"),
    )

    def _partial(rxy, rxz, ryz):
        return (F.col(rxy) - F.col(rxz) * F.col(ryz)) / F.sqrt(
            (1 - F.col(rxz) * F.col(rxz)) * (1 - F.col(ryz) * F.col(ryz))
        )

    rows = rr.select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("volume~revenue | customers").alias("pair"),
                    F.col("rab").alias("raw_r"),
                    _partial("rab", "rac", "rbc").alias("partial_r"),
                ),
                F.struct(
                    F.lit("volume~customers | revenue").alias("pair"),
                    F.col("rac").alias("raw_r"),
                    _partial("rac", "rab", "rbc").alias("partial_r"),
                ),
                F.struct(
                    F.lit("revenue~customers | volume").alias("pair"),
                    F.col("rbc").alias("raw_r"),
                    _partial("rbc", "rab", "rac").alias("partial_r"),
                ),
            )
        ).alias("s"),
    ).select("s.pair", F.col("n").alias("n_weeks"), "s.raw_r", "s.partial_r")
    return rows.select(
        "pair",
        "n_weeks",
        round_eps(F.col("raw_r"), 6).alias("raw_r"),
        round_eps(F.col("partial_r"), 6).alias("partial_r"),
        round_eps(F.col("raw_r") - F.col("partial_r"), 6).alias(
            "confound_shift"
        ),
    ).orderBy("pair")


# ---------------------------------------------------------------- C216

SS_MAX_K = 5


def _ss_oracle() -> str:
    selects = []
    for k in range(1, SS_MAX_K + 1):
        joinexpr = " || ' ' || ".join(f"ts[i + {d}]" for d in range(k))
        selects.append(
            f"""SELECT {k} AS k, {joinexpr} AS g
  FROM toks, UNNEST(range(1, len(ts) - {k - 1} + 1)) AS u(i)"""
        )
    body = "\n  UNION ALL\n".join(selects)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT string_split_regex(lower(text), '\\s+') AS ts FROM documents
),
sh AS (
{body}
),
freqs AS (
  SELECT k, g, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY k, g
),
per_k AS (
  SELECT k,
         CAST(SUM(c) AS BIGINT) AS instances,
         CAST(COUNT(*) AS BIGINT) AS types,
         CAST(MAX(c) AS BIGINT) AS top_count,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS singletons
  FROM freqs GROUP BY k
)
SELECT CAST(k AS BIGINT) AS shingle_k, instances, types, singletons,
       {sql_round('(1.0 - CAST(types AS DOUBLE) / instances) * 100.0', 4)}
         AS dup_mass_pct,
       {sql_round('CAST(top_count AS DOUBLE) * 100.0 / instances', 4)}
         AS top_shingle_pct,
       {sql_round('CAST(singletons AS DOUBLE) * 100.0 / types', 4)}
         AS singleton_type_pct
FROM per_k ORDER BY shingle_k
"""


@register("shingle_size_sensitivity", oracle=_ss_oracle())
def shingle_size_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-order sensitivity sweep k = 1..{SS_MAX_K}: duplicate
    mass (1 - types/instances), top-shingle concentration and
    singleton share of the corpus at every shingle size in ONE
    query. Every dedup design constant in the C-track — minhash
    shingle order, n-gram Jaccard n, decontamination gram — sits
    somewhere on this curve: small k saturates (everything matches
    everything), large k fragments (nothing matches, singletons
    dominate); the elbow is where near-dup detection has signal.
    This is the chart those constants were eyeballed from, computed
    exactly.

    Exactness: all counts are exact integers; three divisions per
    row.

    Scale shape: one union of {SS_MAX_K} map-side explodes over the
    same token arrays, one (k, shingle) count, one k-grain rollup —
    shuffles by shingle hash exactly like the dedup pipelines it
    audits.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), r"\s+").alias("ts")
    )
    toks = toks.persist()
    parts = []
    for k in range(1, SS_MAX_K + 1):
        concat = "x" if k == 1 else (
            "concat(x, " + ", ".join(
                f"' ', ts[i + {d}]" for d in range(1, k)
            ) + ")"
        )
        parts.append(
            toks.select(
                F.lit(k).alias("k"),
                F.explode(
                    F.expr(
                        f"transform(slice(ts, 1, greatest(size(ts) - {k - 1},"
                        f" 0)), (x, i) -> {concat})"
                    )
                ).alias("g"),
            )
        )
    sh = parts[0]
    for p in parts[1:]:
        sh = sh.unionByName(p)
    freqs = sh.groupBy("k", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_k = freqs.groupBy("k").agg(
        F.sum("c").cast("bigint").alias("instances"),
        F.count(F.lit(1)).cast("bigint").alias("types"),
        F.max("c").cast("bigint").alias("top_count"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias(
            "singletons"
        ),
    )
    return per_k.select(
        F.col("k").cast("bigint").alias("shingle_k"),
        "instances",
        "types",
        "singletons",
        round_eps(
            (1.0 - F.col("types").cast("double") / F.col("instances"))
            * 100.0,
            4,
        ).alias("dup_mass_pct"),
        round_eps(
            F.col("top_count").cast("double") * 100.0 / F.col("instances"),
            4,
        ).alias("top_shingle_pct"),
        round_eps(
            F.col("singletons").cast("double") * 100.0 / F.col("types"), 4
        ).alias("singleton_type_pct"),
    ).orderBy("shingle_k")
