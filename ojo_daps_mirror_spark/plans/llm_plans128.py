"""Hundred-twenty-eighth sweep (SURVEY.md §2 B238-B239, C210).

Törnqvist price index beside B153's Fisher (the two superlative
indexes — geometric share-weighted vs geometric-mean-of-bounds — and
the gap between them is the substitution-bias conversation), the
Inclán-Tiao CUSUM-of-squares VARIANCE changepoint (Pettitt/B-track
CUSUM find mean shifts; volatility regime breaks are invisible to
them and this is the classic retrospective detector), and a
consistent-hash ring with virtual nodes (the shard router as data:
per-node balance, then REMOVE a node and prove the 1/n-movement
guarantee — only the dead node's keys move — against dhondt/rendezvous
which re-deal everything).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B238

PI_BASE_YEAR = 1995

_B238_ORACLE = f"""
WITH py AS (
  SELECT l_partkey AS p, CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
),
base AS (
  SELECT p, q AS q0, r AS r0 FROM py WHERE yr = {PI_BASE_YEAR}
),
joined AS (
  SELECT py.yr, py.p, py.q AS qt, py.r AS rt, b.q0, b.r0
  FROM py JOIN base b USING (p)
),
tots AS (
  SELECT yr, CAST(SUM(rt) AS BIGINT) AS srt,
         CAST(SUM(r0) AS BIGINT) AS sr0
  FROM joined GROUP BY yr
),
logsum AS (
  SELECT j.yr, CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(0.5 * (CAST(j.r0 AS DOUBLE) / t.sr0
                    + CAST(j.rt AS DOUBLE) / t.srt)
             * ln((CAST(j.rt AS DOUBLE) / j.qt)
                  / (CAST(j.r0 AS DOUBLE) / j.q0))) AS lt
  FROM joined j JOIN tots t USING (yr)
  GROUP BY j.yr
)
SELECT yr AS year, n_parts,
       {sql_round('exp(lt)', 6)} AS tornqvist,
       {sql_round('lt', 6)} AS log_tornqvist
FROM logsum ORDER BY yr
"""


@register("tornqvist_index", oracle=_B238_ORACLE)
def tornqvist_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Törnqvist price index per ship-year against the {PI_BASE_YEAR}
    base — the OTHER superlative index beside B153's Fisher:
    exp(sum over matched parts of the average expenditure share
    times the log price relative). Fisher bounds substitution bias
    between Laspeyres and Paasche; Törnqvist weights it directly
    with shares, and the (small) Fisher-Törnqvist gap is the
    standard index-number diagnostic. Same matched-part panel and
    exact integer revenue/quantity sums as B153.

    Exactness: shares divide exact integer cents; prices divide
    exact integers; both engines run the identical ln/exp tree and
    the only wobble is double-sum order over parts, absorbed at
    6 dp.

    Scale shape: one fact aggregate to (part, year) grain, one
    broadcastable base-year join, one per-year share total, one
    log-sum reduction — all map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.year("l_shipdate").cast("bigint").alias("yr"),
    ).agg(
        F.sum(F.round(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("q"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100 + 1e-9).cast("bigint")
        )
        .cast("bigint")
        .alias("r"),
    )
    py = py.persist()
    base = py.where(F.col("yr") == PI_BASE_YEAR).select(
        "p", F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    joined = py.join(base, "p").select(
        "yr", "p", F.col("q").alias("qt"), F.col("r").alias("rt"), "q0", "r0"
    )
    tots = joined.groupBy("yr").agg(
        F.sum("rt").cast("bigint").alias("srt"),
        F.sum("r0").cast("bigint").alias("sr0"),
    )
    term = (
        0.5
        * (
            F.col("r0").cast("double") / F.col("sr0")
            + F.col("rt").cast("double") / F.col("srt")
        )
        * F.log(
            (F.col("rt").cast("double") / F.col("qt"))
            / (F.col("r0").cast("double") / F.col("q0"))
        )
    )
    logsum = (
        joined.join(F.broadcast(tots), "yr")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(term).alias("lt"),
        )
    )
    return logsum.select(
        F.col("yr").alias("year"),
        "n_parts",
        round_eps(F.exp(F.col("lt")), 6).alias("tornqvist"),
        round_eps(F.col("lt"), 6).alias("log_tornqvist"),
    ).orderBy("year")


# ---------------------------------------------------------------- B239

IT_CRIT = 1.358  # Inclan-Tiao 5% asymptotic critical value

_B239_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
  FROM weekly
),
sq AS (
  SELECT w, CAST((m.n * y - m.sy) AS HUGEINT)
              * (m.n * y - m.sy) AS f2,
         CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS k, m.n
  FROM weekly, mom m
),
cum AS (
  SELECT w, k, n,
         CAST(SUM(f2) OVER (ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS ck,
         CAST(SUM(f2) OVER () AS DOUBLE) AS cn
  FROM sq
),
dk AS (
  SELECT w, k, n, ck / cn - CAST(k AS DOUBLE) / n AS d
  FROM cum WHERE k < n
),
best AS (
  SELECT w, k, n, d,
         ROW_NUMBER() OVER (ORDER BY ABS(d) DESC, k) AS rk
  FROM dk
)
SELECT n AS n_weeks, w AS break_week, k AS break_index,
       {sql_round('d', 6)} AS d_at_break,
       {sql_round('ABS(d) * sqrt(n / 2.0)', 6)} AS it_stat,
       {IT_CRIT!r} AS crit_5pct,
       CASE WHEN ABS(d) * sqrt(n / 2.0) > {IT_CRIT!r} THEN 1 ELSE 0 END
         AS variance_break_5pct
FROM best WHERE rk = 1
"""


@register("inclan_tiao_variance_break", oracle=_B239_ORACLE)
def inclan_tiao_variance_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclán-Tiao CUSUM-of-SQUARES variance changepoint on weekly
    order volume: D_k = C_k/C_n - k/n over cumulative squared
    deviations, max |D_k| scaled by sqrt(n/2) against the 1.358
    asymptotic 5% point. Pettitt (B-track) and CUSUM find MEAN
    shifts; a volatility regime break (same mean, new variance) is
    invisible to both and is exactly what resizes safety stock,
    control-chart limits and VaR — this is the classic retrospective
    detector for it.

    Exactness: deviations are scaled by n (f = n*y - sum_y, an exact
    integer), so every C_k is an exact 128-bit integer and D_k is a
    ratio of exact integers minus a rational — identical doubles.

    Scale shape: one fact aggregate, one prefix-sum window over
    |weeks| rows, one argmax reduction.
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
    mom = weekly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    dec = "decimal(38,0)"
    f = F.col("n") * F.col("y") - F.col("sy")
    sq = attach_scalars(weekly, mom).select(
        "w",
        (f.cast(dec) * f).alias("f2"),
        F.row_number().over(Window.orderBy("w")).cast("bigint").alias("k"),
        "n",
    )
    w_cum = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = sq.select(
        "w",
        "k",
        "n",
        F.sum("f2").over(w_cum).cast("double").alias("ck"),
        F.sum("f2").over(w_all).cast("double").alias("cn"),
    )
    dk = cum.where(F.col("k") < F.col("n")).select(
        "w",
        "k",
        "n",
        (F.col("ck") / F.col("cn") - F.col("k").cast("double") / F.col("n"))
        .alias("d"),
    )
    best = dk.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("d")).desc(), "k"))
        .alias("rk"),
    ).where(F.col("rk") == 1)
    it = F.abs(F.col("d")) * F.sqrt(F.col("n") / 2.0)
    return best.select(
        F.col("n").alias("n_weeks"),
        F.col("w").alias("break_week"),
        F.col("k").alias("break_index"),
        round_eps(F.col("d"), 6).alias("d_at_break"),
        round_eps(it, 6).alias("it_stat"),
        F.lit(IT_CRIT).alias("crit_5pct"),
        (it > IT_CRIT).cast("int").alias("variance_break_5pct"),
    )


# ---------------------------------------------------------------- C210

RING_NODES = [f"n{i}" for i in range(8)]
RING_VNODES = 32  # virtual nodes per physical node
RING_REMOVED = "n0"


def _h64(s: str) -> int:
    """Python twin of functions.text.hash64 / sql_hash64."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ring(nodes: list[str]) -> tuple[list[int], list[str]]:
    vn = sorted(
        (_h64(f"ring|{node}#{j}"), node)
        for node in nodes
        for j in range(RING_VNODES)
    )
    return [h for h, _ in vn], [n for _, n in vn]


_V_ALL, _O_ALL = _ring(RING_NODES)
_V_CUT, _O_CUT = _ring([n for n in RING_NODES if n != RING_REMOVED])


def _sql_owner(vh: list[int], ow: list[str], h: str) -> str:
    arr_v = "[" + ", ".join(str(v) for v in vh) + "]"
    arr_o = "[" + ", ".join(f"'{o}'" for o in ow) + "]"
    m = len(vh)
    return (
        f"({arr_o})[(len(list_filter({arr_v}, v -> v <= {h})) % {m}) + 1]"
    )


def _spark_owner(vh: list[int], ow: list[str], h) -> F.Column:
    arr_v = "array(" + ", ".join(f"{v}L" for v in vh) + ")"
    arr_o = "array(" + ", ".join(f"'{o}'" for o in ow) + ")"
    m = len(vh)
    return F.expr(
        f"element_at({arr_o},"
        f" int((size(filter({arr_v}, v -> v <= {h})) % {m}) + 1))"
    )


_C210_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, {sql_hash64("'key|' || doc_id")} AS h FROM documents
),
assigned AS (
  SELECT doc_id,
         {_sql_owner(_V_ALL, _O_ALL, 'h')} AS owner,
         {_sql_owner(_V_CUT, _O_CUT, 'h')} AS owner_cut
  FROM keyed
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned),
per_node AS (
  SELECT owner AS node,
         CAST(COUNT(*) AS BIGINT) AS keys_before,
         CAST(SUM(CASE WHEN owner_cut <> owner THEN 1 ELSE 0 END)
              AS BIGINT) AS moved_out
  FROM assigned GROUP BY owner
),
after AS (
  SELECT owner_cut AS node, CAST(COUNT(*) AS BIGINT) AS keys_after
  FROM assigned GROUP BY owner_cut
)
SELECT p.node, p.keys_before,
       CAST(COALESCE(a.keys_after, 0) AS BIGINT) AS keys_after,
       p.moved_out,
       {sql_round('p.keys_before * 100.0 / t.n', 4)} AS share_pct,
       CASE WHEN p.node = '{RING_REMOVED}' THEN 1 ELSE 0 END AS removed
FROM per_node p
LEFT JOIN after a ON p.node = a.node
CROSS JOIN tot t
ORDER BY p.node
"""


@register("consistent_hash_ring", oracle=_C210_ORACLE)
def consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring shard router with {RING_VNODES} virtual
    nodes per physical node, evaluated as data: every document keys
    to the first vnode clockwise on the md5 ring, and the report
    shows per-node balance BEFORE and AFTER removing '{RING_REMOVED}'
    — the consistent-hashing guarantee made auditable: moved_out is
    exactly keys_before for the removed node and exactly 0 for every
    survivor (compare rendezvous_shard_map/B111 and D'Hondt/B-track,
    which re-deal on membership change). The vnode ring is
    data-independent, so it folds to two LITERAL sorted arrays and
    ownership is a pure O(|ring|) array expression per key — the
    router ships inside the expression, no join at all.

    Exactness: ring positions and assignments are exact integers
    from the shared md5 hash64; counts are exact.

    Scale shape: map-only ownership + one 8-group aggregate; at
    100 TB this IS how you route — the ring is a broadcast-free
    constant folded into codegen.
    """
    keyed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        hash64(F.concat(F.lit("key|"), F.col("doc_id").cast("string")))
        .alias("h"),
    )
    assigned = keyed.select(
        "doc_id",
        _spark_owner(_V_ALL, _O_ALL, "h").alias("owner"),
        _spark_owner(_V_CUT, _O_CUT, "h").alias("owner_cut"),
    )
    assigned = assigned.persist()
    tot = assigned.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per_node = assigned.groupBy(F.col("owner").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("keys_before"),
        F.sum((F.col("owner_cut") != F.col("owner")).cast("int"))
        .cast("bigint")
        .alias("moved_out"),
    )
    after = assigned.groupBy(F.col("owner_cut").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("keys_after")
    )
    return (
        attach_scalars(per_node.join(after, "node", "left"), tot)
        .select(
            "node",
            "keys_before",
            F.coalesce(F.col("keys_after"), F.lit(0))
            .cast("bigint")
            .alias("keys_after"),
            "moved_out",
            round_eps(F.col("keys_before") * 100.0 / F.col("n"), 4).alias(
                "share_pct"
            ),
            (F.col("node") == RING_REMOVED).cast("int").alias("removed"),
        )
        .orderBy("node")
    )
