"""Hundred-seventeenth sweep (SURVEY.md §2 B218-B219, C196).

Group-sequential monitoring boundaries (O'Brien-Fleming vs Pocock at
four looks — the peeking-correct alternative to B107's SPRT and the
repair for the silent alpha-spend of re-running B60 every week), the
Bradley-Terry paired-comparison strength model over weekly brand
head-to-heads (fixed-point iterations hash-matched against an
unrolled oracle, the same discipline as trade_pagerank), and the
positional token-entropy curve (which PHYSICAL positions in a doc are
template slots — the complement of C156, which profiles tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B218

GS_SEG_A = "BUILDING"
GS_SEG_B = "MACHINERY"
# Two-sided alpha=0.05, K=4 equally-spaced looks (Jennison & Turnbull,
# "Group Sequential Methods", Table 2.1/2.3 — public constants).
GS_OBF = (4.048, 2.862, 2.337, 2.024)
GS_POCOCK = 2.361

_B218_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS seg,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         o.o_orderdate AS d
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{GS_SEG_A}', '{GS_SEG_B}')
),
spanned AS (
  SELECT seg, y, datediff('day', (SELECT MIN(d) FROM base), d) AS dd,
         datediff('day', (SELECT MIN(d) FROM base),
                  (SELECT MAX(d) FROM base)) + 1 AS span
  FROM base
),
looks AS (
  SELECT k, CAST(k AS BIGINT) AS look
  FROM (SELECT unnest(generate_series(1, 4)) AS k)
),
cells AS (
  SELECT l.look,
         CAST(SUM(CASE WHEN s.seg = '{GS_SEG_A}'
                        AND s.dd < s.span * l.look / 4
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s.seg = '{GS_SEG_A}'
                        AND s.dd < s.span * l.look / 4
                       THEN s.y ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN s.seg = '{GS_SEG_B}'
                        AND s.dd < s.span * l.look / 4
                       THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN s.seg = '{GS_SEG_B}'
                        AND s.dd < s.span * l.look / 4
                       THEN s.y ELSE 0 END) AS BIGINT) AS x2
  FROM spanned s CROSS JOIN looks l
  GROUP BY l.look
),
tested AS (
  SELECT look, n1, x1, n2, x2,
         (x1 * 1.0 / n1 - x2 * 1.0 / n2)
           / sqrt(((x1 + x2) * 1.0 / (n1 + n2))
                  * (1.0 - (x1 + x2) * 1.0 / (n1 + n2))
                  * (1.0 / n1 + 1.0 / n2)) AS z,
         CASE look WHEN 1 THEN {GS_OBF[0]!r} WHEN 2 THEN {GS_OBF[1]!r}
                   WHEN 3 THEN {GS_OBF[2]!r} ELSE {GS_OBF[3]!r} END AS obf
  FROM cells
)
SELECT look,
       {sql_round('look * 25.0', 4)} AS info_pct,
       n1, x1, n2, x2,
       {sql_round('z', 4)} AS z_obs,
       {sql_round('obf', 4)} AS obf_bound,
       {sql_round(str(GS_POCOCK), 4)} AS pocock_bound,
       CASE WHEN abs(z) > obf THEN 1 ELSE 0 END AS crossed_obf,
       CASE WHEN abs(z) > {GS_POCOCK!r} THEN 1 ELSE 0 END AS crossed_pocock
FROM tested ORDER BY look
"""


@register("group_sequential_obf", oracle=_B218_ORACLE)
def group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring of the urgent-rate difference
    between the {GS_SEG_A} and {GS_SEG_B} segments at four
    equally-spaced calendar looks, against O'Brien-Fleming AND
    Pocock two-sided boundaries (K=4, alpha=0.05, Jennison &
    Turnbull's public tables): re-testing an experiment every week
    at 1.96 silently inflates alpha to ~14%; OBF spends almost
    nothing early (|z| must beat 4.05 at 25% information) and
    ~1.96-ish at the end, Pocock spends flat. The pair of crossed_*
    columns shows the policy difference on the same data. The
    fixed-horizon complement of B107's fully-sequential SPRT.

    Exactness: all look cells are exact integer conditional sums
    (the look cutoffs are integer day arithmetic on the span — no
    float dates); the z and both boundaries are identical double
    trees and literal constants.

    Scale shape: one broadcast dim join; the global date span is a
    1-row aggregate attached by broadcast; then ONE conditional
    aggregate produces all four looks' cells (the fact table is
    scanned once, not once per look), and everything after is a
    4-row frame.
    """
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
            F.col("o_orderdate").alias("d"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ),
            "ck",
        )
        .where(F.col("seg").isin(GS_SEG_A, GS_SEG_B))
    )
    span = base.agg(
        F.min("d").alias("dmin"),
        (F.datediff(F.max("d"), F.min("d")) + 1).alias("span"),
    )
    spanned = attach_scalars(base, span).select(
        "seg", "y", F.datediff("d", "dmin").alias("dd"), "span"
    )
    aggs = []
    for k in (1, 2, 3, 4):
        in_look = F.col("dd") < F.col("span") * k / 4
        for seg, tag in ((GS_SEG_A, "1"), (GS_SEG_B, "2")):
            cond = (F.col("seg") == seg) & in_look
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n{tag}_{k}")
            )
            aggs.append(
                F.sum(F.when(cond, F.col("y")).otherwise(0))
                .cast("bigint")
                .alias(f"x{tag}_{k}")
            )
    wide = spanned.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("bigint").alias("look"),
                F.col(f"n1_{k}").alias("n1"),
                F.col(f"x1_{k}").alias("x1"),
                F.col(f"n2_{k}").alias("n2"),
                F.col(f"x2_{k}").alias("x2"),
                F.lit(GS_OBF[k - 1]).alias("obf"),
            )
            for k in (1, 2, 3, 4)
        ]
    )
    cells = wide.select(F.explode(rows).alias("r")).select("r.*")
    p1 = F.col("x1") * 1.0 / F.col("n1")
    p2 = F.col("x2") * 1.0 / F.col("n2")
    pp = (F.col("x1") + F.col("x2")) * 1.0 / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    tested = cells.withColumn("z", z)
    return tested.select(
        "look",
        round_eps(F.col("look") * 25.0, 4).alias("info_pct"),
        "n1",
        "x1",
        "n2",
        "x2",
        round_eps(F.col("z"), 4).alias("z_obs"),
        round_eps(F.col("obf"), 4).alias("obf_bound"),
        round_eps(F.lit(GS_POCOCK), 4).alias("pocock_bound"),
        (F.abs(F.col("z")) > F.col("obf")).cast("int").alias("crossed_obf"),
        (F.abs(F.col("z")) > GS_POCOCK).cast("int").alias("crossed_pocock"),
    ).orderBy("look")


# ---------------------------------------------------------------- B219

BT_ITERS = 3

def _bt_oracle() -> str:
    """Unrolled fixed-point oracle: s_i <- w_i / sum_j n_ij/(s_i+s_j),
    renormalised to mean 1 after every update, {BT_ITERS} times."""
    head = f"""
WITH weekly AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l.l_shipdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.brand AS i, b.brand AS j,
         CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT) AS wij,
         CAST(SUM(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) AS BIGINT) AS nij
  FROM weekly a JOIN weekly b ON a.w = b.w AND a.brand <> b.brand
  GROUP BY a.brand, b.brand
),
wins AS (
  SELECT i AS brand, CAST(SUM(wij) AS BIGINT) AS w,
         CAST(SUM(nij) AS BIGINT) AS games
  FROM pairs GROUP BY i
),
s0 AS (SELECT brand, w, games, 1.0 AS s FROM wins)"""
    prev = "s0"
    body = ""
    for t in range(1, BT_ITERS + 1):
        body += f""",
r{t} AS (
  SELECT wn.brand, wn.w, wn.games,
         wn.w / SUM(p.nij / (si.s + sj.s)) AS s
  FROM wins wn
  JOIN pairs p ON p.i = wn.brand
  JOIN {prev} si ON si.brand = p.i
  JOIN {prev} sj ON sj.brand = p.j
  GROUP BY wn.brand, wn.w, wn.games
),
s{t} AS (
  SELECT brand, w, games,
         s * COUNT(*) OVER () / SUM(s) OVER () AS s
  FROM r{t}
)"""
        prev = f"s{t}"
    tail = f"""
SELECT brand, games, w AS wins,
       {sql_round('w * 100.0 / games', 4)} AS win_rate_pct,
       {sql_round('s', 6)} AS strength,
       CAST(ROW_NUMBER() OVER (ORDER BY s DESC, brand) AS BIGINT) AS rank
FROM {prev} ORDER BY brand
"""
    return head + body + tail


@register("bradley_terry_brands", oracle=_bt_oracle())
def bradley_terry_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry paired-comparison strengths over weekly brand
    head-to-heads (brand i 'beats' j in a week when it ships more
    lines; ties are no game): {BT_ITERS} fixed-point MM updates
    s_i <- w_i / sum_j n_ij/(s_i+s_j) from s=1, renormalised to mean
    1 each step. Where the raw win_rate ranking is distorted by
    schedule strength (beating weak brands often ≠ strong), BT
    conditions every win on WHO it was against — the same reason
    chess uses Elo. Deterministic fixed iterations, hash-matched
    against a {BT_ITERS}x-unrolled oracle (trade_pagerank's
    discipline, operators/graph.py).

    Exactness: the pair tournament table is exact integers; each
    update is the identical double expression tree on a 25-row
    frame, and the renormalisation pins the scale both engines see.

    Scale shape: one fact-dim join to the (brand, week) frame; the
    head-to-head self-join runs at that dimension grain (|brands|^2
    x |weeks| pair-weeks); all {BT_ITERS} iterations are joins over
    |brands|^2 pair rows — the corpus is scanned once.
    """
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_shipdate").alias("sd")
        )
        .join(
            load_table(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("pk"),
                F.col("p_brand").alias("brand"),
            ),
            "pk",
        )
        .groupBy(
            "brand",
            (
                F.datediff(
                    F.date_trunc("week", F.col("sd")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pairs = (
        weekly.alias("a")
        .join(
            weekly.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.brand") != F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("i"), F.col("b.brand").alias("j"))
        .agg(
            F.sum(F.when(F.col("a.c") > F.col("b.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("wij"),
            F.sum(F.when(F.col("a.c") != F.col("b.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("nij"),
        )
    )
    pairs = pairs.persist()
    wins = pairs.groupBy(F.col("i").alias("brand")).agg(
        F.sum("wij").cast("bigint").alias("w"),
        F.sum("nij").cast("bigint").alias("games"),
    )
    w_all = Window.partitionBy()
    s = wins.select("brand", "w", "games", F.lit(1.0).alias("s"))
    for _ in range(BT_ITERS):
        si = s.select(F.col("brand").alias("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("brand").alias("j"), F.col("s").alias("s_j"))
        raw = (
            wins.join(pairs, wins.brand == pairs.i)
            .join(F.broadcast(si), "i")
            .join(F.broadcast(sj), "j")
            .groupBy("brand", "w", "games")
            .agg(
                (
                    F.max("w")
                    / F.sum(
                        F.col("nij") / (F.col("s_i") + F.col("s_j"))
                    )
                ).alias("s")
            )
        )
        s = raw.select(
            "brand",
            "w",
            "games",
            (
                F.col("s")
                * F.count(F.lit(1)).over(w_all)
                / F.sum("s").over(w_all)
            ).alias("s"),
        )
    return s.select(
        "brand",
        "games",
        F.col("w").alias("wins"),
        round_eps(F.col("w") * 100.0 / F.col("games"), 4).alias(
            "win_rate_pct"
        ),
        round_eps(F.col("s"), 6).alias("strength"),
        F.row_number()
        .over(Window.orderBy(F.col("s").desc(), "brand"))
        .cast("bigint")
        .alias("rank"),
    ).orderBy("brand")


# ---------------------------------------------------------------- C196

PE_MAX_POS = 20  # profile the first N token positions

_C196_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
pos_toks AS (
  SELECT source,
         unnest(list_transform(
           generate_series(1, least(len(t), {PE_MAX_POS})),
           i -> {{'pos': i, 'tok': t[i]}})) AS pt
  FROM toks
),
cnt AS (
  SELECT source, pt.pos AS pos, pt.tok AS tok,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pos_toks GROUP BY 1, 2, 3
),
slot AS (
  SELECT source, pos, CAST(SUM(c) AS BIGINT) AS n,
         CAST(MAX(c) AS BIGINT) AS cmax,
         SUM(c * ln(c * 1.0)) AS clnc
  FROM cnt GROUP BY source, pos
)
SELECT source, CAST(pos AS BIGINT) AS pos, n AS n_docs,
       {sql_round('ln(n * 1.0) - clnc / n', 4)} AS entropy_nats,
       {sql_round('cmax * 100.0 / n', 4)} AS top_token_pct
FROM slot ORDER BY source, pos
"""


@register("positional_entropy_curve", oracle=_C196_ORACLE)
def positional_entropy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token entropy of each of the first {PE_MAX_POS} PHYSICAL
    positions per source (plus the top token's share at that slot):
    templated text pins specific positions to near-zero entropy
    ('Click', 'here', 'to', ...) while natural text is flat-high
    from position 1 — the slot-level template detector. C156 asks
    'where do the top tokens sit'; this asks 'how free is each
    seat', which catches templates whose slot-fillers are individually
    rare (so no token is globally top) but positionally locked.

    Exactness: per-slot counts are exact integers; entropy uses the
    ln n - (sum c ln c)/n identity so only one double sum per slot
    (over that slot's bounded token distribution) exists in either
    engine.

    Scale shape: the explode is capped at {PE_MAX_POS} tokens per
    doc regardless of doc length (map-side slice before explode), one
    (source, pos, token) shuffle, then a (source, pos)-grain
    reduction to a |sources| x {PE_MAX_POS} report.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    positional = toks.select(
        "source",
        F.posexplode(
            F.slice(
                F.col("t"),
                1,
                F.least(F.size("t"), F.lit(PE_MAX_POS)),
            )
        ).alias("pos0", "tok"),
    ).select("source", (F.col("pos0") + 1).alias("pos"), "tok")
    cnt = positional.groupBy("source", "pos", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    slot = cnt.groupBy("source", "pos").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.max("c").cast("bigint").alias("cmax"),
        F.sum(F.col("c") * F.log(F.col("c") * 1.0)).alias("clnc"),
    )
    return slot.select(
        "source",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("n").alias("n_docs"),
        round_eps(
            F.log(F.col("n") * 1.0) - F.col("clnc") / F.col("n"), 4
        ).alias("entropy_nats"),
        round_eps(F.col("cmax") * 100.0 / F.col("n"), 4).alias(
            "top_token_pct"
        ),
    ).orderBy("source", "pos")
