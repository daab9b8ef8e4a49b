"""Eightieth sweep (SURVEY.md §2 B146-B147, C155).

Durbin-Watson residual autocorrelation (is the OLS trend fit's error
series actually independent — the diagnostic that invalidates B57's
standard errors when it fails), the economic order quantity plan
(the sqrt(2DS/H) inventory policy — operations' oldest closed-form
optimization, per brand), and the chunk-level dedup-rate curve
(what fraction of fixed-size token chunks are verbatim repeats, by
chunk size — the SlimPajama-style "does sub-document dedup pay"
number that whole-doc dedup C5 and passage fingerprinting C153
bracket from either side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_hash64
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B146

_B146_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
suff AS (
  SELECT w, y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(w) OVER () AS BIGINT) AS sw,
         CAST(SUM(y) OVER () AS BIGINT) AS sy,
         CAST(SUM(w * w) OVER () AS BIGINT) AS sww,
         CAST(SUM(w * y) OVER () AS BIGINT) AS swy
  FROM weekly
),
resid AS (
  SELECT w, n,
         (n * swy - sw * sy) * 1.0 / (n * sww - sw * sw) AS b,
         y - (sy * 1.0 / n
              - ((n * swy - sw * sy) * 1.0 / (n * sww - sw * sw))
                * (sw * 1.0 / n))
           - ((n * swy - sw * sy) * 1.0 / (n * sww - sw * sw)) * w AS e
  FROM suff
),
lagged AS (
  SELECT n, b, e, LAG(e) OVER (ORDER BY w) AS e_prev
  FROM resid
)
SELECT MAX(n) AS n_weeks,
       {sql_round('MAX(b)', 6)} AS slope,
       {sql_round(
           'SUM(CASE WHEN e_prev IS NULL THEN 0.0'
           '         ELSE (e - e_prev) * (e - e_prev) END)'
           ' / SUM(e * e)', 6)} AS dw_stat,
       {sql_round(
           '1.0 - (SUM(CASE WHEN e_prev IS NULL THEN 0.0'
           '            ELSE (e - e_prev) * (e - e_prev) END)'
           ' / SUM(e * e)) / 2.0', 6)} AS rho_lag1
FROM lagged
"""


@register("durbin_watson", oracle=_B146_ORACLE)
def durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the weekly-volume OLS
    trend (B57's fit): DW ~ 2 means independent errors, DW << 2
    means positive autocorrelation — the failure mode that makes
    trend-line standard errors (and every forecast band built on
    them) overconfident. Reports DW and the implied lag-1 residual
    correlation 1 - DW/2.

    Exactness: the OLS slope/intercept come from exact BIGINT window
    sums over the |weeks| frame (no fact-side floats); residuals and
    the DW ratio are identical IEEE expression shapes in both
    engines, and the only float accumulation is over the bounded
    dimension frame.

    Scale shape: fact scan collapses to |weeks| rows once; four
    window passes over that bounded frame (sums, residual, lag);
    O(1) final algebra. At 100 TB nothing after the first aggregate
    sees data volume.
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
    suff = weekly.select(
        "w",
        "y",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("w").over(w_all).cast("bigint").alias("sw"),
        F.sum("y").over(w_all).cast("bigint").alias("sy"),
        F.sum(F.col("w") * F.col("w")).over(w_all).cast("bigint").alias("sww"),
        F.sum(F.col("w") * F.col("y")).over(w_all).cast("bigint").alias("swy"),
    )
    n, sw, sy, sww, swy = (
        F.col("n"),
        F.col("sw"),
        F.col("sy"),
        F.col("sww"),
        F.col("swy"),
    )
    b = (n * swy - sw * sy) * 1.0 / (n * sww - sw * sw)
    resid = suff.select(
        "w",
        "n",
        b.alias("b"),
        (
            F.col("y") - (sy * 1.0 / n - b * (sw * 1.0 / n)) - b * F.col("w")
        ).alias("e"),
    )
    lagged = resid.select(
        "n", "b", "e", F.lag("e").over(Window.orderBy("w")).alias("e_prev")
    )
    e, e_prev = F.col("e"), F.col("e_prev")
    num = F.sum(
        F.when(e_prev.isNull(), 0.0).otherwise((e - e_prev) * (e - e_prev))
    )
    den = F.sum(e * e)
    return lagged.agg(
        F.max("n").alias("n_weeks"),
        round_eps(F.max("b"), 6).alias("slope"),
        round_eps(num / den, 6).alias("dw_stat"),
        round_eps(1.0 - (num / den) / 2.0, 6).alias("rho_lag1"),
    )


# ---------------------------------------------------------------- B147

EOQ_ORDER_COST = 100.0  # fixed cost per replenishment order, $
EOQ_HOLD_FRAC = 0.2  # holding cost as a fraction of unit price, $/unit

_B147_ORACLE = f"""
WITH demand AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
),
price AS (
  SELECT p_brand AS brand,
         CAST(SUM(CAST(ROUND(p_retailprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS pc,
         CAST(COUNT(*) AS BIGINT) AS np
  FROM part GROUP BY 1
),
joined AS (
  SELECT brand, d,
         (pc * 1.0 / np) / 100.0 AS avg_price
  FROM demand JOIN price USING (brand)
)
SELECT brand, d AS demand,
       {sql_round('avg_price', 4)} AS avg_unit_price,
       {sql_round(
           f'sqrt(2.0 * d * {EOQ_ORDER_COST!r}'
           f' / ({EOQ_HOLD_FRAC!r} * avg_price))', 4)} AS eoq_units,
       {sql_round(
           f'd / sqrt(2.0 * d * {EOQ_ORDER_COST!r}'
           f' / ({EOQ_HOLD_FRAC!r} * avg_price))', 4)} AS n_orders
FROM joined ORDER BY brand
"""


@register("eoq_plan", oracle=_B147_ORACLE)
def eoq_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand — Harris's sqrt(2DS/H)
    policy with ordering cost S = ${EOQ_ORDER_COST} and holding cost
    H = {EOQ_HOLD_FRAC} x average unit retail price: the reorder lot
    size that minimises ordering + holding cost, and the number of
    replenishment cycles it implies over the demand horizon. The
    closed-form inventory twin of B140's Croston demand estimate.

    Exactness: demand is an exact BIGINT quantity sum; brand price
    comes from the dimension alone (exact cents sum / count); the
    EOQ algebra is O(1) per brand with identical IEEE shapes.

    Scale shape: one fact aggregate (map-side combined) to |brands|
    rows riding a broadcast dim join; the price frame is dim-only.
    """
    part = load_table(spark, sf_dir, "part")
    demand = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), "l_quantity")
        .join(
            F.broadcast(
                part.select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("d")
        )
    )
    price = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.round(F.col("p_retailprice") * 100 + 1e-9).cast("bigint"))
        .cast("bigint")
        .alias("pc"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    joined = demand.join(F.broadcast(price), "brand").select(
        "brand",
        "d",
        ((F.col("pc") * 1.0 / F.col("np")) / 100.0).alias("avg_price"),
    )
    d, ap = F.col("d"), F.col("avg_price")
    eoq = F.sqrt(2.0 * d * EOQ_ORDER_COST / (EOQ_HOLD_FRAC * ap))
    return joined.select(
        "brand",
        d.alias("demand"),
        round_eps(ap, 4).alias("avg_unit_price"),
        round_eps(eoq, 4).alias("eoq_units"),
        round_eps(d / eoq, 4).alias("n_orders"),
    ).orderBy("brand")


# ---------------------------------------------------------------- C155

CHUNK_SIZES = (32, 64, 128)


def _c155_chunk_cte(size: int) -> str:
    toks = "string_split_regex(lower(text), '\\s+')"
    return f"""
  SELECT {size} AS chunk_size,
         unnest(list_transform(
           generate_series(1, len(t) // {size}),
           j -> {sql_hash64(
               f"array_to_string(t[(j-1)*{size}+1 : j*{size}], ' ')")}))
           AS h
  FROM (SELECT {toks} AS t FROM documents)"""


_C155_ORACLE = f"""
WITH chunks AS (
  {" UNION ALL ".join(_c155_chunk_cte(s) for s in CHUNK_SIZES)}
),
per_hash AS (
  SELECT chunk_size, h, CAST(COUNT(*) AS BIGINT) AS c
  FROM chunks GROUP BY chunk_size, h
)
SELECT chunk_size,
       CAST(SUM(c) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       {sql_round('1.0 - COUNT(*) * 1.0 / SUM(c)', 6)} AS dup_rate,
       CAST((SUM(c) - COUNT(*)) * chunk_size AS BIGINT)
         AS dup_tokens_removable
FROM per_hash GROUP BY chunk_size ORDER BY chunk_size
"""


@register("chunk_dedup_rate", oracle=_C155_ORACLE)
def chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup-rate curve: split every doc into
    non-overlapping {CHUNK_SIZES}-token chunks, hash each, and report
    per chunk size the fraction of chunks that are verbatim repeats
    plus the training tokens removable by chunk dedup — the
    SlimPajama-style sub-document dedup payoff that whole-doc
    signatures (C5) understate and passage fingerprints (C153)
    localise; read next to C142's context-length frontier when
    picking the packing unit.

    Scale shape: ONE documents scan — every chunk size's hashes are
    built map-side from the same token array (bounded slices over a
    materialised column, no re-evaluation) and unioned as
    (size, hash) structs before a single explode; one shuffle to
    (size, hash) grain; the report is a |sizes|-row second aggregate.
    Ragged tails are excluded (floor(len/size) full chunks) so the
    rate isn't polluted by length effects.
    """
    per_size = []
    for s in CHUNK_SIZES:
        chunks = F.when(
            F.size(F.col("t")) >= s,
            F.expr(
                f"transform(sequence(1, size(t) div {s}),"
                f" j -> conv(substring(md5("
                f"array_join(slice(t, (j-1)*{s}+1, {s}), ' ')"
                f"), 1, 15), 16, 10))"
            ).cast("array<bigint>"),
        ).otherwise(F.array().cast("array<bigint>"))
        per_size.append(
            F.transform(
                chunks,
                lambda h: F.struct(
                    F.lit(s).alias("chunk_size"), h.alias("h")
                ),
            )
        )
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    exploded = docs.select(
        F.explode(F.concat(*per_size)).alias("ch")
    ).select(
        F.col("ch.chunk_size").alias("chunk_size"), F.col("ch.h").alias("h")
    )
    per_hash = exploded.groupBy("chunk_size", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        per_hash.groupBy("chunk_size")
        .agg(
            F.sum("c").cast("bigint").alias("total_chunks"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
            round_eps(
                1.0 - F.count(F.lit(1)) * 1.0 / F.sum("c"), 6
            ).alias("dup_rate"),
        )
        .select(
            "chunk_size",
            "total_chunks",
            "distinct_chunks",
            "dup_rate",
            (
                (F.col("total_chunks") - F.col("distinct_chunks"))
                * F.col("chunk_size")
            )
            .cast("bigint")
            .alias("dup_tokens_removable"),
        )
        .orderBy("chunk_size")
    )
