"""Eleventh sweep (SURVEY.md §2 B47, C64–C65).

Exact prefix-filtered set-similarity join (the PPJoin candidate rule —
no lossy blocking, no DF cap), last-touch marketing attribution as an
as-of-join composition, and item co-occurrence recommendations
(market-basket lift) on lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..operators.asof import asof_join
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .text_plans import MH_SHINGLE_K, _jaccard_verify

# ---------------------------------------------------------------- C64

# Prefix filtering prunes in proportion to (1-t): at the corpus-dedup
# threshold 0.8 each doc indexes only its rarest ~20% of shingles and
# the positional filter bites hard. (C7's 0.5 is a different, recall-
# oriented operating point served by the lossy blocked path.)
PREFIX_T = 0.8

# Ground-truth oracle: ALL pairs with 3-gram Jaccard >= t, computed by
# the quadratic self-join DuckDB can afford at test SFs. The Spark plan
# must reproduce this EXACTLY — prefix filtering is a lossless candidate
# rule, unlike C7's 5-gram blocking + DF cap (which trades recall for
# bounded postings).
_C64_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
jac AS (
  SELECT a.doc_id AS i, b.doc_id AS j,
         len(list_intersect(a.sh, b.sh)) * 1.0
           / len(list_distinct(a.sh || b.sh)) AS jac
  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
)
SELECT i AS id_a, j AS id_b, ROUND(jac + 1e-9, 4) AS jaccard
FROM jac WHERE jac >= {PREFIX_T}
ORDER BY id_a, id_b
"""


def prefix_filter_pairs(spark: SparkSession, sf_dir: str, t: float) -> DataFrame:
    """Exact Jaccard-threshold pair set at threshold ``t`` via the C64
    prefix-filter machinery — reused by the C76 dedup-recall evaluator
    as its distributed ground truth. See ``jaccard_prefix_filter``."""
    return _prefix_filter_impl(spark, sf_dir, t)


@register("jaccard_prefix_filter", oracle=_C64_ORACLE)
def jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold set-similarity self-join via PPJoin prefix
    filtering (Xiao et al., WWW'08) — the lossless scale path next to
    C7's lossy blocking.

    Rule: order every document's shingles by GLOBAL rarity (document
    frequency asc, shingle asc). If J(A,B) >= t then A and B must share
    a shingle within their first ``|X| - ceil(t*|X|) + 1`` rarest
    shingles — so candidate generation only indexes that prefix.
    At t=0.8 each doc indexes ~20% of its shingles, and because
    prefixes hold each document's globally RAREST shingles, hot-shingle
    buckets empty out by construction instead of by a recall-losing
    cap. Pairs are pruned further by the PPJoin length filter
    (t*max(|A|,|B|) <= min(|A|,|B|)) and the positional filter (the
    residual-suffix overlap bound) before the exact-Jaccard verify.

    Document frequency is a map-side-combined vocab-sized aggregate
    broadcast back onto the stream; the per-doc rarity rank is the one
    full-stream shuffle; one groupBy builds the prefix postings; pairs
    expand map-side from sorted bucket lists — then the shared
    ``_jaccard_verify`` (semi-join + broadcast pair frame). Reproduces
    the reference's near-dup edge semantics (deduplication.py) with
    zero false negatives at the declared threshold.
    """
    return _prefix_filter_impl(spark, sf_dir, PREFIX_T)


def _prefix_filter_impl(spark: SparkSession, sf_dir: str, t: float) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    docs = raw.select(
        "doc_id", shingles(tokens(F.col("text")), MH_SHINGLE_K).alias("sh")
    )
    # the exploded stream feeds the DF aggregate AND the rank pass —
    # two cheap map passes; re-shingling beats caching a stream that is
    # corpus-sized at 100 TB
    ex = docs.select(
        "doc_id", F.size("sh").alias("len"), F.explode("sh").alias("s")
    )
    # document frequency via a map-side-combined groupBy (vocab-sized
    # result, broadcast back onto a second map pass) — NOT a window
    # over the exploded stream: a window shuffles and sorts the full
    # stream, the groupBy shuffles only combined partials. The one
    # unavoidable full-stream shuffle is the per-doc rarity rank.
    df_counts = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    prefix = (
        ex.join(F.broadcast(df_counts), "s")
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .where(
            F.col("rnk")
            <= F.col("len") - F.ceil(F.lit(t) * F.col("len")) + 1
        )
        .select("s", "doc_id", "len", "rnk")
    )
    # postings grouped once per prefix shingle; pairs expanded map-side
    posts = (
        prefix.groupBy("s")
        .agg(
            F.array_sort(
                F.collect_set(F.struct(F.col("doc_id").alias("d"), "len", "rnk"))
            ).alias("ds")
        )
        .where(F.size("ds") >= 2)
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.filter(
                F.transform(
                    F.slice(ds, i + F.lit(2), F.size(ds)),
                    lambda y: F.struct(
                        x["d"].alias("i"),
                        y["d"].alias("j"),
                        x["len"].alias("la"),
                        y["len"].alias("lb"),
                        x["rnk"].alias("pa"),
                        y["rnk"].alias("pb"),
                    ),
                ),
                # PPJoin length filter (t·max(|A|,|B|) ≤ min) AND the
                # positional filter: overlap is bounded by
                # 1 + min(|A|−pa, |B|−pb), which must reach the
                # threshold-implied minimum overlap t/(1+t)·(|A|+|B|)
                lambda p: (
                    F.lit(t) * F.greatest(p["la"], p["lb"])
                    <= F.least(p["la"], p["lb"])
                )
                & (
                    1 + F.least(p["la"] - p["pa"], p["lb"] - p["pb"])
                    >= F.lit(t / (1 + t)) * (p["la"] + p["lb"])
                ),
            ),
        )
    )
    cand = (
        posts.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    return _jaccard_verify(raw, cand, MH_SHINGLE_K, threshold=t)


# ---------------------------------------------------------------- B47

ATTRIB_WINDOW_DAYS = 7

_B47_ORACLE = f"""
WITH touches AS (
  SELECT user_id, ts, event_type, event_id,
         row_number() OVER (
           PARTITION BY user_id, ts
           ORDER BY event_type DESC, event_id DESC
         ) AS rn
  FROM events WHERE event_type IN ('click', 'view')
),
t2 AS (SELECT user_id, ts, event_type FROM touches WHERE rn = 1),
att AS (
  SELECT p.event_id, p.user_id, p.value, l.event_type AS tt, l.ts AS tts
  FROM events p
  LEFT JOIN LATERAL (
    SELECT t.event_type, t.ts FROM t2 t
    WHERE t.user_id = p.user_id AND t.ts <= p.ts
      AND t.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
    ORDER BY t.ts DESC LIMIT 1
  ) l ON TRUE
  WHERE p.event_type = 'purchase'
)
SELECT event_id, user_id,
       COALESCE(tt, 'organic') AS touch_type,
       CASE WHEN tts IS NULL THEN 0.0
            ELSE CAST(round({sql_round('value', 2)}, 2) AS DOUBLE) END
         AS attributed_value
FROM att ORDER BY event_id
"""


@register("last_touch_attribution", oracle=_B47_ORACLE)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the same
    user's most recent click/view at-or-before the purchase, if within
    7 days; otherwise 'organic'.

    Composition of the B7 as-of operator (union + one key-shuffle
    window — no range join, no per-key loop): the latest touch <= ts is
    carried onto the purchase row, then touches older than the window
    null out AFTER the join (the latest touch being stale implies no
    touch in the window at all, so a post-filter is exact). Touch rows
    are deduplicated per (user, ts) with a deterministic argmax first —
    the as-of contract requires unique build times per key.
    """
    ev = load_table(spark, sf_dir, "events")
    w_tie = Window.partitionBy("user_id", "ts").orderBy(
        F.desc("event_type"), F.desc("event_id")
    )
    touches = (
        ev.where(F.col("event_type").isin("click", "view"))
        .withColumn("rn", F.row_number().over(w_tie))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("tts"), F.col("event_type").alias("tt"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    att = asof_join(
        purchases,
        touches,
        key="user_id",
        probe_time="ts",
        build_time="tts",
        build_values=["tt", "tts"],
    )
    in_window = F.col("tts") >= F.col("ts") - F.expr(
        f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS"
    )
    return (
        att.select(
            "event_id",
            "user_id",
            F.when(in_window, F.col("tt")).otherwise("organic").alias("touch_type"),
            F.when(in_window, F.round(round_eps(F.col("value"), 2), 2))
            .otherwise(0.0)
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- C65

BASKET_CAP = 50  # max distinct parts expanded per order (skew guard)
COOC_MIN_COUNT = 2
COOC_TOP_K = 3

_C65_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
sized AS (
  SELECT l_orderkey FROM baskets
  GROUP BY l_orderkey HAVING COUNT(*) <= {BASKET_CAP}
),
b AS (SELECT baskets.* FROM baskets JOIN sized USING (l_orderkey)),
part_n AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
pairs AS (
  SELECT x.l_partkey AS a, y.l_partkey AS bp, COUNT(*) AS pair_count
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
  GROUP BY 1, 2
),
scored AS (
  SELECT a AS part, bp AS co_part, pair_count,
         {sql_round('pair_count * 1.0 * (SELECT n FROM n_orders)'
                    ' / (pa.n * pb.n)', 6)} AS lift
  FROM pairs JOIN part_n pa ON pairs.a = pa.l_partkey
             JOIN part_n pb ON pairs.bp = pb.l_partkey
  WHERE pair_count >= {COOC_MIN_COUNT}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY part ORDER BY pair_count DESC, lift DESC, co_part
  ) AS rank FROM scored
)
SELECT part, co_part, pair_count, lift, rank
FROM ranked WHERE rank <= {COOC_TOP_K}
ORDER BY part, rank
"""


@register("item_cooccurrence", oracle=_C65_ORACLE)
def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence recommender (market-basket lift): for each
    part, the top-3 parts most often co-ordered with it, ranked by
    (pair_count, lift).

    Baskets = distinct parts per order, capped at {BASKET_CAP} (one
    degenerate mega-basket would expand O(cap²) pairs — the guard drops
    it whole, mirroring production co-visitation jobs). Pairs expand
    MAP-SIDE from each order's sorted part list (orders average ~4
    lines, so the expansion is ~x4 rows, not a self-join), then one
    (a,b)-grain count aggregate — map-side combined — and lift attaches
    via two broadcast-sized part-count joins. The final top-k runs a
    window over the already-aggregated pair table (pairs ≪ lineitem).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # baskets feed four subtrees (pairs, both part-count sides, |orders|);
    # materialise once or Catalyst re-runs the basket aggregate per subtree
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .where(F.size("parts") <= BASKET_CAP)
        .persist()
    )
    parts = F.col("parts")
    # ordered pairs (a != b) expanded map-side: for each x, all y != x
    pair_arr = F.flatten(
        F.transform(
            parts,
            lambda x: F.transform(
                F.filter(parts, lambda y: y != x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= COOC_MIN_COUNT)
    )
    # persisted: the two aliased broadcast sides below defeat
    # ReuseExchange, so without it the explode+agg over baskets runs
    # once per lift side
    part_n = (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    # |orders| attaches as a broadcast one-row scalar (never a driver count)
    n_orders = baskets.agg(F.count("*").alias("n_orders"))
    scored = (
        pairs.join(
            F.broadcast(part_n.select(F.col("pk").alias("a"), F.col("n").alias("na"))),
            "a",
        )
        .join(
            F.broadcast(part_n.select(F.col("pk").alias("b"), F.col("n").alias("nb"))),
            "b",
        )
        .transform(scalars(n_orders))
        .select(
            F.col("a").alias("part"),
            F.col("b").alias("co_part"),
            "pair_count",
            round_eps(
                F.col("pair_count") * F.col("n_orders") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.desc("pair_count"), F.desc("lift"), F.asc("co_part")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= COOC_TOP_K)
        .orderBy("part", "rank")
    )
