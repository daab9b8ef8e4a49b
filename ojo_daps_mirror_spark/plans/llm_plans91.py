"""Ninety-first sweep (SURVEY.md §2 B168-B169, C166).

Rolling 8-week beta of a segment against total revenue (the moving
co-movement coefficient — B57 fits ONE slope for all time, this
shows the slope drifting), the Cramér's V association matrix across
the categorical columns (which dimensions are redundant — the
categorical cousin of B45's correlation matrix), and the LSH
blocking-precision audit (what fraction of C5's band-collision
candidates survive exact verification — the number that prices the
verify stage and tunes bands x rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .text_plans import (
    JACCARD_THRESHOLD,
    MH_BUCKET_CAP,
    MH_PERMS,
    MH_PRIME,
    MH_ROWS_PER_BAND,
    MH_SHINGLE_K,
    _MH_A_SQL,
    _MH_B_SQL,
    minhash_bands,
)

# ---------------------------------------------------------------- B168

RB_SEG = "BUILDING"
RB_WIN = 8

_B168_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN c.c_mktsegment = '{RB_SEG}'
                       THEN CAST(ROUND(o.o_totalprice * 100 + 1e-9)
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
roll AS (
  SELECT w,
         CAST(COUNT(*) OVER win AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) OVER win AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) OVER win AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) OVER win AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) OVER win AS HUGEINT) AS sxy
  FROM weekly
  WINDOW win AS (ORDER BY w ROWS BETWEEN {RB_WIN - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT w AS week,
       {sql_round(
           'CAST(n * sxy - sx * sy AS DOUBLE)'
           ' / CAST(n * sxx - sx * sx AS DOUBLE)', 6)} AS beta
FROM roll WHERE n = {RB_WIN} ORDER BY w
"""


@register("rolling_beta", oracle=_B168_ORACLE)
def rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {RB_WIN}-week regression slope (beta) of the {RB_SEG}
    segment's weekly revenue against TOTAL weekly revenue — the
    moving co-movement coefficient: beta ~ segment share when the
    segment tracks the book, drifting beta is mix shift in motion
    (B57 fits one slope for all time; B75's period-over-period sees
    levels, not coupling).

    Exactness: weekly cents are exact BIGINTs; the rolling
    sufficient statistics accumulate as 128-bit integers inside the
    window frame (squares of weekly totals pass 2^63 by ~sf1), so
    each beta is ONE double division of exact integers. Incomplete
    leading windows are dropped by exact count.

    Scale shape: one orders-customer join then a single aggregate to
    the |weeks| frame; five window sums over that bounded frame.
    """
    cents = F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            cents.alias("cents"),
        )
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "ck",
        )
        .groupBy(
            (
                F.datediff(
                    F.date_trunc("week", F.col("d")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w")
        )
        .agg(
            F.sum("cents").cast("bigint").alias("x"),
            F.sum(
                F.when(F.col("seg") == RB_SEG, F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    win = Window.orderBy("w").rowsBetween(-(RB_WIN - 1), 0)
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    roll = weekly.select(
        "w",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum(xd).over(win).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).over(win).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * xd).over(win).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * yd).over(win).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n")
    beta = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        roll.where(n == RB_WIN)
        .select(F.col("w").alias("week"), round_eps(beta, 6).alias("beta"))
        .orderBy("week")
    )


# ---------------------------------------------------------------- B169

_CV_PAIRS = (
    ("priority", "status"),
    ("priority", "segment"),
    ("status", "segment"),
)


def _b169_pair_cte(a: str, b: str) -> str:
    return f"""
  SELECT '{a}' AS col_a, '{b}' AS col_b,
         CAST(COUNT(DISTINCT {a}) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT {b}) AS BIGINT) AS c,
         CAST(MAX(nn) AS BIGINT) AS n,
         SUM(o2 / (rm * 1.0 * cm)) AS s
  FROM (
    SELECT {a}, {b},
           CAST(COUNT(*) AS BIGINT) * COUNT(*) AS o2,
           CAST(SUM(COUNT(*)) OVER (PARTITION BY {a}) AS BIGINT) AS rm,
           CAST(SUM(COUNT(*)) OVER (PARTITION BY {b}) AS BIGINT) AS cm,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
    FROM base GROUP BY {a}, {b}
  )"""


_B169_ORACLE = f"""
WITH base AS (
  SELECT o.o_orderpriority AS priority, o.o_orderstatus AS status,
         c.c_mktsegment AS segment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
pairs AS ({" UNION ALL ".join(_b169_pair_cte(a, b) for a, b in _CV_PAIRS)})
SELECT col_a, col_b, r AS card_a, c AS card_b,
       {sql_round('n * (s - 1.0)', 4)} AS chi2,
       {sql_round(
           'sqrt(n * (s - 1.0) / (n * (LEAST(r, c) - 1.0)))', 6)}
         AS cramers_v
FROM pairs ORDER BY col_a, col_b
"""


@register("cramers_v_matrix", oracle=_B169_ORACLE)
def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between every pair of the categorical order
    dimensions (priority, status, customer segment) — the bounded
    [0,1] association matrix that says which dimensions are
    redundant before a cube (B15) or a feature set (A23) doubles up
    on them; the categorical cousin of B45's Pearson matrix, using
    the identity chi2 = n (sum o_ij^2/(r_i c_j) - 1) so no expected-
    count frame is ever materialised.

    Exactness: cell counts and marginals are exact BIGINTs from one
    aggregate per pair (marginals as windows over the cell frame,
    not second scans); chi2 and V are O(1) algebra per pair.

    Scale shape: one orders-customer join feeds three cell-grain
    aggregates (cells bounded by category cardinalities); the
    output is 3 rows.
    """
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "ck",
        )
        .select("priority", "status", "segment")
    )
    base = base.persist()
    outs = []
    for a, b in _CV_PAIRS:
        cells = base.groupBy(a, b).agg(
            F.count(F.lit(1)).cast("bigint").alias("o")
        )
        w_r = Window.partitionBy(a)
        w_c = Window.partitionBy(b)
        w_all = Window.partitionBy()
        enriched = cells.select(
            F.col("o"),
            F.sum("o").over(w_r).cast("bigint").alias("rm"),
            F.sum("o").over(w_c).cast("bigint").alias("cm"),
            F.sum("o").over(w_all).cast("bigint").alias("nn"),
        )
        red = enriched.agg(
            F.max("nn").cast("bigint").alias("n"),
            F.sum(
                (F.col("o").cast("double") * F.col("o"))
                / (F.col("rm") * 1.0 * F.col("cm"))
            ).alias("s"),
        )
        card = base.agg(
            F.countDistinct(a).cast("bigint").alias("r"),
            F.countDistinct(b).cast("bigint").alias("c"),
        )
        chi2 = F.col("n") * (F.col("s") - 1.0)
        outs.append(
            red.transform(scalars(card)).select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("r").alias("card_a"),
                F.col("c").alias("card_b"),
                round_eps(chi2, 4).alias("chi2"),
                round_eps(
                    F.sqrt(
                        chi2 / (F.col("n") * (F.least("r", "c") - 1.0))
                    ),
                    6,
                ).alias("cramers_v"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------- C166

_C166_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
ex AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT & 2147483647 AS h31
  FROM (SELECT doc_id, unnest(sh) AS s FROM docs)
),
mh AS (
  SELECT doc_id, p,
         MIN(({_MH_A_SQL}[p + 1] * h31 + {_MH_B_SQL}[p + 1])
             % {MH_PRIME}) AS mh
  FROM ex CROSS JOIN (SELECT unnest(generate_series(0, {MH_PERMS - 1})) AS p)
  GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {MH_ROWS_PER_BAND} AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY p)) AS sig
  FROM mh GROUP BY doc_id, p // {MH_ROWS_PER_BAND}
),
bsize AS (
  SELECT band, sig FROM bands
  GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND {MH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.sig = a.sig
),
jac AS (
  SELECT i, j,
         len(list_intersect(da.sh, db.sh)) * 1.0
           / len(list_distinct(da.sh || db.sh)) AS jac
  FROM cand
  JOIN docs da ON i = da.doc_id
  JOIN docs db ON j = db.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN jac >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_confirmed,
       {sql_round(
           f'SUM(CASE WHEN jac >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END)'
           ' * 1.0 / COUNT(*)', 6)} AS blocking_precision,
       {sql_round('AVG(jac)', 6)} AS mean_candidate_jaccard
FROM jac
"""


@register("lsh_candidate_precision", oracle=_C166_ORACLE)
def lsh_candidate_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-precision audit of C5's MinHash-LSH front end: of
    all band-collision candidate pairs, how many survive exact
    Jaccard >= {JACCARD_THRESHOLD}? Precision prices the verify
    stage (1 - precision is wasted re-shingling), and together with
    C101's recall-style audits it is the empirical S-curve operating
    point that says whether bands x rows ({MH_PERMS // MH_ROWS_PER_BAND}
    x {MH_ROWS_PER_BAND}) match the threshold. Reuses the IDENTICAL
    band front end (`minhash_bands`) and constants as C5 — the audit
    cannot drift from the audited pipeline.

    Scale shape: same as C5 (map-side signatures, one band-bucket
    shuffle, bucket-capped pair expansion, semi-join before
    re-shingling) with the verify output reduced to one summary row
    instead of the pair list.
    """
    raw = load_table(spark, sf_dir, "documents")
    bands = minhash_bands(raw)
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= MH_BUCKET_CAP))
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    cand = cand.persist()
    cand_ids = cand.select(
        F.explode(F.array("i", "j")).alias("doc_id")
    ).distinct()
    docs = (
        raw.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select(
            "doc_id", shingles(tokens(F.col("text")), MH_SHINGLE_K).alias("sh")
        )
        .persist()
    )
    jac = (
        docs.select(F.col("doc_id").alias("i"), F.col("sh").alias("sh_a"))
        .join(F.broadcast(cand), "i")
        .join(
            docs.select(
                F.col("doc_id").alias("j"), F.col("sh").alias("sh_b")
            ).hint("broadcast"),
            "j",
        )
        .select(
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                * F.lit(1.0)
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jac")
        )
    )
    conf = F.when(F.col("jac") >= JACCARD_THRESHOLD, 1).otherwise(0)
    return jac.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(conf).cast("bigint").alias("n_confirmed"),
        round_eps(F.sum(conf) * 1.0 / F.count(F.lit(1)), 6).alias(
            "blocking_precision"
        ),
        round_eps(F.avg("jac"), 6).alias("mean_candidate_jaccard"),
    )
