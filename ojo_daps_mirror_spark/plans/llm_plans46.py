"""Forty-sixth sweep (SURVEY.md §2 B95, C105-C106).

The two-pass exact median (the no-global-sort order-statistic pattern
that scales where a percentile sort buffer doesn't), a centroid-based
silhouette score for embedding-cluster quality, and a Heaps'-law
vocabulary-growth fit over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B95

MED_BUCKET = 100_000  # $1000 coarse buckets over integer cents

_B95_ORACLE = f"""
WITH cents AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_round('quantile_cont(c, 0.5) / 100.0', 4)} AS median_price
FROM cents
"""


@register("exact_median_two_pass", oracle=_B95_ORACLE)
def exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median of order price computed WITHOUT a global sort or a
    per-group percentile buffer — the two-pass order-statistic
    pattern: pass 1 builds a coarse value histogram (map-side
    combined, ≤ a few hundred buckets), a cumulative window over the
    tiny histogram locates which bucket holds each middle order
    statistic and its within-bucket rank, pass 2 ranks ONLY the rows
    of those buckets (a broadcast semi-join the scan can push down).
    The oracle is the engine-native quantile — equality proves the
    decomposition exact, ties and even-n midpoint included.

    Scale shape: at 100 TB an exact percentile over a sort buffer is
    the thing you cannot run; this shape reads the fact twice but
    sorts only ~1/|buckets| of it, and generalises to any k-th order
    statistic (and per-group medians via bucket-per-group histograms).
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    hist = (
        cents.groupBy((F.col("c") / MED_BUCKET).cast("bigint").alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bkt",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(w_cum).alias("upto"),
    )
    n_row = cents.agg(F.count(F.lit(1)).alias("n"))
    # the two middle order statistics (1-based); equal when n is odd
    pos = n_row.select(
        "n",
        F.explode(
            F.array(
                F.floor((F.col("n") + 1) / 2).cast("bigint"),
                F.floor((F.col("n") + 2) / 2).cast("bigint"),
            )
        ).alias("k"),
    )
    # which bucket holds position k, and k's rank within that bucket
    target = (
        pos.join(
            F.broadcast(cum),
            (F.col("k") > F.col("below")) & (F.col("k") <= F.col("upto")),
        )
        .select("n", "bkt", (F.col("k") - F.col("below")).alias("r"))
    )
    # pass 2: rank only the rows of the (at most two) target buckets
    in_bkt = cents.join(
        F.broadcast(target.select("bkt").distinct()),
        (F.col("c") / MED_BUCKET).cast("bigint") == F.col("bkt"),
    ).select("bkt", "c")
    w_rank = Window.partitionBy("bkt").orderBy("c")
    ranked = in_bkt.withColumn("rn", F.row_number().over(w_rank))
    picked = ranked.join(
        F.broadcast(target),
        (ranked.bkt == target.bkt) & (ranked.rn == target.r),
    ).select("n", "c")
    return picked.groupBy("n").agg(
        round_eps(F.avg("c") / 100.0, 4).alias("median_price")
    ).select(F.col("n").alias("n_rows"), "median_price")


# ---------------------------------------------------------------- C105

SIL_Q = 6  # centroid components quantised to 6 dp before distances


def _c105_centroid_sql() -> str:
    return f"""
cexp AS (
  SELECT label, d.d AS dim, AVG(e[d.d]) AS v
  FROM v, unnest(generate_series(1, 64)) AS d(d)
  GROUP BY 1, 2
),
cent AS (
  SELECT label,
         list(ROUND(v + 1e-9, {SIL_Q}) ORDER BY dim) AS c
  FROM cexp GROUP BY label
)"""


_C105_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings
),
{_c105_centroid_sql().lstrip()},
dists AS (
  SELECT v.vec_id, v.label, cent.label AS clabel,
         sqrt(list_dot_product(
           list_transform(range(1, 65), i -> v.e[i] - cent.c[i]),
           list_transform(range(1, 65), i -> v.e[i] - cent.c[i]))) AS dist
  FROM v CROSS JOIN cent
),
ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN clabel = label THEN dist END) AS a,
         MIN(CASE WHEN clabel <> label THEN dist END) AS b
  FROM dists GROUP BY 1, 2
),
s AS (
  SELECT label,
         CAST(ROUND((b - a) / greatest(a, b) * 1e6) AS BIGINT) AS s6
  FROM ab
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       {sql_round('SUM(s6) / 1e6 / COUNT(*)', 6)} AS mean_silhouette,
       CAST(SUM(CASE WHEN s6 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM s GROUP BY label ORDER BY label
"""


@register("centroid_silhouette", oracle=_C105_ORACLE)
def centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based (simplified) silhouette per label: a = distance
    to own centroid, b = distance to the nearest OTHER centroid,
    s = (b-a)/max(a,b) — the O(n·k) cluster-quality score that replaces
    the O(n²) pairwise silhouette at corpus scale; `n_negative` counts
    vectors sitting closer to a foreign centroid (C59's outlier gate
    aggregated to cluster grain).

    Scale shape: centroids from ONE (label, dim) partial-sum aggregate
    (nothing vector-grain shuffles), quantised to {SIL_Q} dp so both
    engines measure distances to IDENTICAL centroids; the |labels|-row
    centroid table broadcasts onto one map pass; per-row s quantised to
    integer micro-units so label means are exact integer sums.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    cexp = (
        emb.select(
            "label", F.posexplode("e").alias("dim0", "val")
        )
        .groupBy("label", "dim0")
        .agg(F.avg("val").alias("v"))
    )
    cent = (
        cexp.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim0", round_eps(F.col("v"), SIL_Q).alias("q")))
            ).alias("cs")
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform("cs", lambda s: s["q"]).alias("c"),
        )
    )
    diff = F.zip_with(F.col("e"), F.col("c"), lambda x, y: (x - y) * (x - y))
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    dists = emb.transform(scalars(cent)).select(
        "vec_id", "label", "clabel", dist.alias("dist")
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist"))).alias("b"),
    )
    s6 = F.round(
        (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1e6
    ).cast("bigint")
    return (
        ab.select("label", s6.alias("s6"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            round_eps(F.sum("s6") / 1e6 / F.count(F.lit(1)), 6).alias(
                "mean_silhouette"
            ),
            F.sum(F.when(F.col("s6") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------- C106

_C106_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id,
         len(list_filter({sql_tokens('text')}, t -> t <> '')) AS n_tok,
         len(list_distinct(list_filter({sql_tokens('text')}, t -> t <> '')))
           AS n_typ
  FROM documents
),
pts AS (
  SELECT ln(n_tok) AS x, ln(n_typ) AS y FROM per_doc WHERE n_tok > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round('regr_slope(y, x)', 6)} AS beta,
       {sql_round('exp(regr_intercept(y, x))', 6)} AS k,
       {sql_round('regr_r2(y, x)', 6)} AS r2
FROM pts
"""


@register("heaps_law_fit", oracle=_C106_ORACLE)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K·nᵝ of vocabulary growth: per-doc
    (ln tokens, ln distinct tokens) points, one regr_* OLS in log-log
    space — the corpus-health statistic that catches boilerplate
    corpora (β collapses toward 0) and token-inflation bugs (β → 1),
    next to C34's flat counts.

    Scale shape: token/type counts are pure per-row array expressions
    (no explode, no shuffle); the fit is ONE aggregate of mergeable
    regr sufficient statistics (B55's million-group recipe at corpus
    grain) — 5 doubles cross the wire per partition.
    """
    toks = F.filter(tokens(F.col("text")), lambda t: t != "")
    per_doc = load_table(spark, sf_dir, "documents").select(
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
    )
    pts = per_doc.where(F.col("n_tok") > 0).select(
        F.log("n_tok").alias("x"), F.log("n_typ").alias("y")
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_eps(F.regr_slope("y", "x"), 6).alias("beta"),
        round_eps(F.exp(F.regr_intercept("y", "x")), 6).alias("k"),
        round_eps(F.regr_r2("y", "x"), 6).alias("r2"),
    )
