"""Fifty-third sweep (SURVEY.md §2 B103-B104, C117).

Isotonic calibration by pool-adjacent-violators (the monotone-repair
step behind calibrated propensity curves, run as an in-expression
fold), session entry/exit & bounce analysis on B5's sessionization,
and per-document unigram entropy (the information-density quality
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import attach_scalars
from ..operators.rank import global_order_stats, ntile_from_rank
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B103

ISO_BINS = 10  # acctbal deciles
ISO_PASSES = ISO_BINS - 1  # PAVA converges in <= n-1 merge passes
# "conversion" = repeat-heavy customer (>= this many orders): a noisy
# ~30%-positive target, so the decile curve actually has violations for
# PAVA to repair (has-any-order is 100% here — degenerate)
ISO_MIN_ORDERS = 12


def _iso_oracle() -> str:
    # one PAVA pass as a fold over singleton-wrapped pools: merge the
    # incoming pool into the accumulator's last pool when the last
    # rate EXCEEDS the incoming rate (violation), comparing rates by
    # exact integer cross-multiplication. list_reduce seeds from the
    # first element, so elements are singleton lists of pool structs.
    merged = (
        "struct_pack(lo := acc[len(acc)].lo, hi := pl[1].hi, "
        "n := acc[len(acc)].n + pl[1].n, y := acc[len(acc)].y + pl[1].y)"
    )
    pass_expr = f"""list_reduce(
      list_transform(ps, p -> [p]),
      (acc, pl) -> CASE
        WHEN acc[len(acc)].y * pl[1].n > pl[1].y * acc[len(acc)].n
        THEN acc[1:len(acc) - 1] || [{merged}]
        ELSE acc || pl END)"""
    return f"""
WITH deciles AS (
  SELECT c_custkey,
         NTILE({ISO_BINS}) OVER (ORDER BY c_acctbal, c_custkey) AS d
  FROM customer
),
conv AS (
  SELECT d.d, d.c_custkey,
         CASE WHEN o.k IS NULL THEN 0 ELSE 1 END AS y
  FROM deciles d
  LEFT JOIN (SELECT o_custkey AS k FROM orders
             GROUP BY 1 HAVING COUNT(*) >= {ISO_MIN_ORDERS}) o
    ON d.c_custkey = o.k
),
cells AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS y
  FROM conv GROUP BY d
),
pooled AS (
  SELECT list(struct_pack(lo := d, hi := d, n := n, y := y) ORDER BY d)
    AS ps
  FROM cells
),
solved AS (
  SELECT list_reduce(
    [ps] || list_transform(generate_series(1, {ISO_PASSES}), x -> ps),
    (ps, ignored) -> {pass_expr}) AS pools
  FROM pooled
),
expanded AS (
  SELECT unnest(pools) AS pool FROM solved
),
iso AS (
  SELECT unnest(generate_series(pool.lo, pool.hi)) AS d,
         pool.y * 1.0 / pool.n AS iso_rate
  FROM expanded
)
SELECT c.d AS decile, c.n, c.y AS conversions,
       {sql_round('c.y * 1.0 / c.n', 6)} AS raw_rate,
       {sql_round('i.iso_rate', 6)} AS iso_rate
FROM cells c JOIN iso i USING (d) ORDER BY decile
"""


@register("isotonic_calibration", oracle=_iso_oracle())
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression by pool-adjacent-violators over the
    acctbal-decile conversion curve — the monotone repair behind
    calibrated propensities (B64's lift deciles assume monotonicity;
    PAVA enforces it). {ISO_PASSES} left-to-right merge passes (a pass
    per potential violation) folded INSIDE one array expression —
    B98's no-driver-loop recipe — with violations compared by EXACT
    integer cross-multiplication (y_a·n_b > y_b·n_a), so no float
    enters until the final rates.

    Scale shape: the fact work is one decile window + one semi-join +
    one 10-row aggregate; PAVA itself runs on the collapsed 10-pool
    row. Per-group curves (per segment) pool the same way with a
    group key on every frame.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    # Decile via the range-partitioned global rank + the exact NTILE
    # closed form — no unpartitioned NTILE window over customer grain
    # (operators/rank.py).
    n_tot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    deciles = attach_scalars(
        global_order_stats(cust, ["c_acctbal", "c_custkey"], rn_col="rn"),
        n_tot,
    ).select(
        "c_custkey",
        ntile_from_rank(F.col("rn"), F.col("n_tot"), ISO_BINS).alias("d"),
    )
    buyers = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= ISO_MIN_ORDERS)
        .select("k")
    )
    conv = deciles.join(buyers, deciles.c_custkey == buyers.k, "left").select(
        "d", F.when(F.col("k").isNull(), 0).otherwise(1).alias("y")
    )
    cells = conv.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("bigint").alias("y")
    )
    pooled = cells.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("d").alias("lo"),
                    F.col("d").alias("hi"),
                    F.col("n").alias("n"),
                    F.col("y").alias("y"),
                )
            )
        ).alias("ps")
    )

    def one_pass(ps, _):
        def step(acc, p):
            # F.get is 0-indexed and NULL-safe on the empty accumulator
            # (ANSI element_at would throw on out-of-bounds)
            last = F.get(acc, F.size(acc) - 1)
            violation = last["y"] * p["n"] > p["y"] * last["n"]
            merged = F.struct(
                last["lo"].alias("lo"),
                p["hi"].alias("hi"),
                (last["n"] + p["n"]).alias("n"),
                (last["y"] + p["y"]).alias("y"),
            )
            return F.when(
                (F.size(acc) > 0) & violation,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(p)))

        empty = F.expr(
            "CAST(array() AS "
            "array<struct<lo:int,hi:int,n:bigint,y:bigint>>)"
        )
        return F.aggregate(ps, empty, step)

    solved = pooled.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(ISO_PASSES)), F.col("ps"), one_pass
        ).alias("pools")
    )
    iso = (
        solved.select(F.explode("pools").alias("pool"))
        .select(
            F.explode(
                F.sequence(F.col("pool.lo"), F.col("pool.hi"))
            ).alias("d"),
            (F.col("pool.y") * 1.0 / F.col("pool.n")).alias("iso_rate"),
        )
    )
    return (
        cells.join(F.broadcast(iso), "d")
        .select(
            F.col("d").alias("decile"),
            "n",
            F.col("y").alias("conversions"),
            round_eps(F.col("y") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            round_eps(F.col("iso_rate"), 6).alias("iso_rate"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------- B104

SESSION_GAP_MIN = 30  # minutes — B5's sessionization constant

_B104_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM ordered
),
per_session AS (
  SELECT user_id, sid,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(struct_pack(ts := ts, eid := event_id, et := event_type)).et
           AS entry_type,
         MAX(struct_pack(ts := ts, eid := event_id, et := event_type)).et
           AS exit_type
  FROM sess GROUP BY 1, 2
)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       {sql_round(
           'SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)',
           6)} AS bounce_rate,
       {sql_round('SUM(n_events) * 1.0 / COUNT(*)', 4)} AS avg_events,
       {sql_round(
           "SUM(CASE WHEN exit_type = 'purchase' THEN 1 ELSE 0 END)"
           " * 1.0 / COUNT(*)", 6)} AS purchase_exit_rate
FROM per_session GROUP BY entry_type ORDER BY entry_type
"""


@register("session_entry_exit", oracle=_B104_ORACLE)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit analysis over B5's sessions: per ENTRY event type
    the session count, bounce rate (single-event sessions), mean
    session depth and the share of sessions that END in a purchase —
    the landing-page diagnostic built on the same 30-min-gap
    sessionization as B5/B51 (argmin/argmax by (ts, event_id) picks
    entry and exit deterministically).

    Scale shape: the gap-and-island windows and the session aggregate
    all share ONE user-key partitioning (a single shuffle); the report
    is |event_types| rows. Entry/exit come from struct-MIN/MAX — one
    aggregate, no per-session sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    brk = F.when(
        gap_us > SESSION_GAP_MIN * 60 * 1_000_000, 1
    ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    sess = (
        load_table(spark, sf_dir, "events")
        .withColumn("brk", brk)
        .withColumn("sid", F.sum("brk").over(w_cum))
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(
            F.struct(F.col("ts"), F.col("event_id").alias("eid"),
                     F.col("event_type").alias("et"))
        )["et"].alias("entry_type"),
        F.max(
            F.struct(F.col("ts"), F.col("event_id").alias("eid"),
                     F.col("event_type").alias("et"))
        )["et"].alias("exit_type"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounce.cast("bigint").alias("n_bounces"),
            round_eps(bounce * 1.0 / F.count(F.lit(1)), 6).alias(
                "bounce_rate"
            ),
            round_eps(F.sum("n_events") * 1.0 / F.count(F.lit(1)), 4).alias(
                "avg_events"
            ),
            round_eps(
                F.sum(
                    F.when(F.col("exit_type") == "purchase", 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("purchase_exit_rate"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------- C117

_C117_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_sort(list_filter({sql_tokens('text')}, t -> t <> '')) AS st
  FROM documents
),
runs AS (
  SELECT doc_id, len(st) AS n,
         list_filter(range(1, len(st) + 1),
                     i -> i = 1 OR st[i] <> st[i - 1]) AS bpos
  FROM toks WHERE len(st) > 0
),
counted AS (
  SELECT doc_id, n, len(bpos) AS n_types,
         list_transform(range(1, len(bpos) + 1),
           j -> ((bpos[2:len(bpos)] || [n + 1])[j]) - bpos[j]) AS cs
  FROM runs
),
scored AS (
  SELECT doc_id,
         CAST(n AS BIGINT) AS n_tok,
         CAST(n_types AS BIGINT) AS n_types,
         CAST(list_sum(list_transform(cs, c -> ROUND(
           -(c * 1.0 / n) * ln(c * 1.0 / n) * 1e9))) AS BIGINT) AS h9
  FROM counted
)
SELECT doc_id, n_tok, n_types,
       {sql_round('h9 / 1e9', 6)} AS entropy,
       CASE WHEN n_types > 1
            THEN {sql_round('h9 / 1e9 / ln(n_types)', 6)}
            ELSE 0.0 END AS norm_entropy
FROM scored ORDER BY doc_id
"""


@register("unigram_entropy", oracle=_C117_ORACLE)
def unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy H = −Σ p ln p and its normalised
    form H/ln(types) — the information-density quality signal (low
    entropy = repetitive boilerplate; the continuous version of C17's
    Gopher repetition flags).

    Scale shape: ENTIRELY per-row array expressions — ZERO shuffles,
    pure codegen. Type counts come from run lengths over the SORTED
    token array (boundary positions + adjacent differences), so the
    per-doc cost is O(n log n), not the O(types·tokens) of a
    count-per-type scan (measured 3.6 → 1.6 s at sf0.1). Each type's
    entropy term quantises to integer nano-units before the per-doc
    sum, so both engines add exact integers in any order.
    """
    st = F.array_sort(F.filter(tokens(F.col("text")), lambda t: t != ""))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", st.alias("st"))
        .where(F.size("st") > 0)
        .withColumn("n", F.size("st"))
    )
    stc, n = F.col("st"), F.col("n")
    # boundary positions of runs in the sorted array; the i=1 guard
    # short-circuits before st[i-1] (ANSI element_at would throw at 0)
    bpos = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (F.element_at(stc, i.cast("int"))
           != F.element_at(stc, (i - 1).cast("int"))),
    )
    counted = docs.withColumn("bpos", bpos).withColumn(
        "cs",
        F.zip_with(
            F.col("bpos"),
            F.concat(
                F.slice(F.col("bpos"), 2, F.greatest(F.size("bpos") - 1, F.lit(0))),
                F.array(n + 1),
            ),
            lambda a, b: b - a,
        ),
    )
    p = lambda c: c * 1.0 / n  # noqa: E731
    h9 = F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda a, c: a + F.round(-p(c) * F.log(p(c)) * 1e9),
    ).cast("bigint")
    scored = counted.select(
        "doc_id",
        n.cast("bigint").alias("n_tok"),
        F.size("bpos").cast("bigint").alias("n_types"),
        h9.alias("h9"),
    )
    return scored.select(
        "doc_id",
        "n_tok",
        "n_types",
        round_eps(F.col("h9") / 1e9, 6).alias("entropy"),
        F.when(
            F.col("n_types") > 1,
            round_eps(F.col("h9") / 1e9 / F.log("n_types"), 6),
        )
        .otherwise(0.0)
        .alias("norm_entropy"),
    ).orderBy("doc_id")
