"""Forty-ninth sweep (SURVEY.md §2 B98-B99, C111).

Markov-chain removal-effect attribution (the data-driven model that
completes the attribution family: B47 last-touch, B73 U-shaped, B98
counterfactual), the cohort LTV triangle, and a blocklist content
filter for the corpus gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.snapshot import monday_of
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B98

MK_CHANNELS = ("click", "error", "signup", "view")  # sorted; purchase = CONV
MK_STATES = MK_CHANNELS + ("START",)
MK_ITERS = 25  # absorption fixed-point steps (identical both engines)
MK_VARIANTS = ("none",) + MK_CHANNELS


def _mk_transitions_sql() -> str:
    """Journey transition probabilities from the event log — first
    purchase ends the journey (CONV); journeys without one absorb to
    NULL from their last state."""
    return """
seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER w AS rn,
         MIN(CASE WHEN event_type = 'purchase' THEN rn_i END)
           OVER (PARTITION BY user_id) AS pn,
         MAX(rn_i) OVER (PARTITION BY user_id) AS nmax,
         LAG(event_type) OVER w AS prev
  FROM (
    SELECT user_id, event_type, ts, event_id,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS rn_i
    FROM events
  )
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
journey AS (
  SELECT * FROM seq WHERE rn <= COALESCE(pn, nmax)
),
steps AS (
  SELECT COALESCE(prev, 'START') AS f,
         CASE WHEN event_type = 'purchase' THEN 'CONV'
              ELSE event_type END AS t
  FROM journey
  UNION ALL
  SELECT event_type AS f, 'NULL' AS t
  FROM journey WHERE pn IS NULL AND rn = nmax
),
counts AS (
  SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c FROM steps GROUP BY 1, 2
),
base AS (
  SELECT f, t, c * 1.0 / SUM(c) OVER (PARTITION BY f) AS p FROM counts
)"""


def _mk_oracle() -> str:
    variants = ", ".join(f"'{v}'" for v in MK_VARIANTS)
    states = ", ".join(
        f"('{s}', {i + 1})" for i, s in enumerate(MK_STATES)
    )
    ps_cols = ", ".join(
        f"SUM(CASE WHEN t = '{c}' THEN p ELSE 0 END)" for c in MK_CHANNELS
    )
    # ::DOUBLE[] is load-bearing: a bare [0.0, ...] literal types as
    # DECIMAL(1,1) in DuckDB and the whole fold would quantise to ONE
    # decimal place.
    zero = "[" + ", ".join("0.0" for _ in MK_STATES) + "]::DOUBLE[]"
    start_idx = len(MK_STATES)
    return f"""
WITH {_mk_transitions_sql().lstrip()},
variants AS (SELECT unnest([{variants}]) AS variant),
redirected AS (
  SELECT v.variant, b.f,
         CASE WHEN b.t = v.variant THEN 'NULL' ELSE b.t END AS t,
         b.p
  FROM base b CROSS JOIN variants v
  WHERE b.f <> v.variant
),
grid AS (
  SELECT v.variant, s.s, s.sidx
  FROM variants v CROSS JOIN (VALUES {states}) AS s(s, sidx)
),
probs AS (
  SELECT variant, f, [{ps_cols}] AS ps,
         SUM(CASE WHEN t = 'CONV' THEN p ELSE 0 END) AS pc
  FROM redirected GROUP BY 1, 2
),
m AS (
  SELECT g.variant,
         list(struct_pack(
           ps := COALESCE(p.ps, ({zero})[1:{len(MK_CHANNELS)}]),
           pc := COALESCE(p.pc, 0.0)) ORDER BY g.sidx) AS rows_
  FROM grid g LEFT JOIN probs p ON g.variant = p.variant AND g.s = p.f
  GROUP BY g.variant
),
solved AS (
  SELECT variant,
         list_reduce(
           [{zero}] || list_transform(generate_series(1, {MK_ITERS}),
                                      x -> {zero}),
           (acc, q) -> list_transform(rows_,
             r -> ROUND(r.pc + list_dot_product(r.ps,
                        acc[1:{len(MK_CHANNELS)}]), 12))
         )[{start_idx}] AS p_conv
  FROM m
),
eff AS (
  SELECT s.variant AS channel, b.p_conv AS p_base, s.p_conv AS p_removed,
         (b.p_conv - s.p_conv) / b.p_conv AS effect
  FROM solved s CROSS JOIN (
    SELECT p_conv FROM solved WHERE variant = 'none') b
  WHERE s.variant <> 'none'
)
SELECT channel, {sql_round('p_base', 6)} AS p_base,
       {sql_round('p_removed', 6)} AS p_removed,
       {sql_round('effect', 6)} AS removal_effect,
       {sql_round('effect / SUM(effect) OVER ()', 6)} AS share
FROM eff ORDER BY channel
"""


@register("markov_attribution", oracle=_mk_oracle())
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016):
    model user journeys START→channels→{{CONV,NULL}} as a first-order
    chain, compute each channel's counterfactual removal effect
    (relative drop in absorption probability when its state redirects
    to NULL) and normalise to attribution shares — the data-driven
    model completing B47 (last-touch) and B73 (position rules).

    Scale shape: the ONLY corpus-volume work is one user-partitioned
    window pass + one (from,to) count aggregate. The chain itself is a
    ≤{len(MK_STATES)}-state matrix per variant, so absorption solves as
    a {MK_ITERS}-step fixed point folded INSIDE one array expression
    per variant row — no driver loop, no per-iteration job. The state
    vector quantises to 12 dp each step, so both engines iterate
    identical doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_user).alias("rn"),
        F.lag("event_type").over(w_user).alias("prev"),
    ).select(
        "*",
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn")))
        .over(w_all)
        .alias("pn"),
        F.max("rn").over(w_all).alias("nmax"),
    )
    journey = seq.where(F.col("rn") <= F.coalesce("pn", "nmax"))
    # Each journey row emits its step — and, iff it is the LAST row of
    # a non-converting user, the absorbing →NULL step too — from ONE
    # map-side explode (the conditional second element is a 0/1-length
    # slice), instead of a self-union whose two branches each re-ran
    # the user-window pass over the corpus.
    step_arr = F.concat(
        F.array(
            F.struct(
                F.coalesce("prev", F.lit("START")).alias("f"),
                F.when(F.col("event_type") == "purchase", "CONV")
                .otherwise(F.col("event_type"))
                .alias("t"),
            )
        ),
        F.slice(
            F.array(
                F.struct(
                    F.col("event_type").alias("f"), F.lit("NULL").alias("t")
                )
            ),
            1,
            (F.col("pn").isNull() & (F.col("rn") == F.col("nmax"))).cast(
                "int"
            ),
        ),
    )
    steps = journey.select(F.explode(step_arr).alias("st")).select(
        "st.f", "st.t"
    )
    counts = steps.groupBy("f", "t").agg(F.count(F.lit(1)).alias("c"))
    # Tail collapse (r8, guide §2.4/§5): everything below `counts` is
    # ≤(|states|+2)² rows of exact integers, so the redirect grid, the
    # per-f normalisation, the matrix assembly and the MK_ITERS-step
    # fixed point for all five variants fold into array expressions
    # over ONE collected row — replacing the old tiny-frame cascade
    # (two createDataFrame dims, a grid join, a collect_list groupBy,
    # ~20 Exchange nodes of pure scheduler latency per query). Every
    # number is the same double: totals are exact BIGINT sums, each
    # matrix entry is the single division c/total(f) the old per-f
    # window produced (the old ps/pc group-sums only ever added exact
    # 0.0 terms to it), and the fold is the identical expression tree
    # the old per-variant rows ran. Compile-time redirect: for variant
    # v, state s==v contributes zero rows (the old `f != variant`
    # filter) and channel c==v collects nothing (t==v redirected to
    # the absorbing NULL) — both are Python-side conditions here.
    arr_df = counts.groupBy().agg(
        F.collect_list(F.struct("f", "t", "c")).alias("arr")
    )

    # All tail expressions are assembled as SQL TEXT parsed by one
    # F.expr each (the r7 salary/minhash lesson, guide §5): a first cut
    # built the same trees through the python lambda-HOF API and spent
    # ~13 s PER BUILD in py4j round-trips — the driver pays that per
    # query on a real cluster too. Float literals are spelled with the
    # D suffix so parsing yields the same DOUBLE the Column API's
    # F.lit(0.0) produced (a bare 0.0 parses as DECIMAL).
    def _cnt(s: str, t: str) -> str:
        return (
            f"aggregate(filter(arr, x -> x.f = '{s}' AND x.t = '{t}'), "
            "CAST(0 AS BIGINT), (a, x) -> a + x.c)"
        )

    def _tot(s: str) -> str:
        return (
            f"aggregate(filter(arr, x -> x.f = '{s}'), "
            "CAST(0 AS BIGINT), (a, x) -> a + x.c)"
        )

    def _p(s: str, t: str) -> str:
        # c * 1.0 / total(f): identical arithmetic to the old per-f
        # window normalisation. A state never seen as `f` had no probs
        # row and coalesced to 0.0 — the CASE guard reproduces that.
        return (
            f"(CASE WHEN {_tot(s)} > 0 THEN {_cnt(s, t)} * 1.0D / {_tot(s)} "
            "ELSE 0.0D END)"
        )

    def _rows(v: str) -> str:
        entries = []
        for s in MK_STATES:
            ps = ", ".join(
                "0.0D" if (s == v or c == v) else _p(s, c)
                for c in MK_CHANNELS
            )
            pc = "0.0D" if s == v else _p(s, "CONV")
            entries.append(f"named_struct('ps', array({ps}), 'pc', {pc})")
        return "array(" + ", ".join(entries) + ")"

    zero_v = "array(" + ", ".join("0.0D" for _ in MK_STATES) + ")"

    def _fold(v: str) -> str:
        # The same fixed-point tree the old per-variant rows ran: each
        # step quantises to 12 dp, the dot product is the identical
        # zip_with/aggregate left fold.
        dot = (
            "aggregate(zip_with(r.ps, slice(acc, 1, "
            f"{len(MK_CHANNELS)}), (x, y) -> x * y), 0.0D, (a, x) -> a + x)"
        )
        return (
            f"element_at(aggregate(sequence(1, {MK_ITERS}), {zero_v}, "
            f"(acc, i) -> transform({_rows(v)}, "
            f"r -> round(r.pc + {dot}, 12))), {len(MK_STATES)})"
        )

    eff = arr_df.select(
        F.expr(_fold("none")).alias("p_base"),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('channel', '{v}', 'p_removed', {_fold(v)})"
                    for v in MK_CHANNELS
                )
                + ")"
            )
        ).alias("x"),
    ).select(
        F.col("x.channel").alias("channel"),
        "p_base",
        F.col("x.p_removed").alias("p_removed"),
        ((F.col("p_base") - F.col("x.p_removed")) / F.col("p_base")).alias(
            "effect"
        ),
    )
    return eff.select(
        "channel",
        round_eps(F.col("p_base"), 6).alias("p_base"),
        round_eps(F.col("p_removed"), 6).alias("p_removed"),
        round_eps(F.col("effect"), 6).alias("removal_effect"),
        round_eps(
            F.col("effect") / F.sum("effect").over(Window.partitionBy()), 6
        ).alias("share"),
    ).orderBy("channel")


# ---------------------------------------------------------------- B99

_B99_ORACLE = f"""
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts))::DATE AS cohort
  FROM events GROUP BY user_id
),
horizon AS (
  SELECT date_trunc('week', MAX(ts))::DATE AS max_week FROM events
),
cohort_size AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM cohorts GROUP BY cohort
),
purchases AS (
  SELECT c.cohort,
         CAST(datediff('day', c.cohort, date_trunc('week', e.ts)::DATE) / 7
              AS BIGINT) AS age,
         CAST(ROUND(e.value * 10000) AS BIGINT) AS v4
  FROM events e JOIN cohorts c USING (user_id)
  WHERE e.event_type = 'purchase'
),
cells AS (
  SELECT cohort, age, SUM(v4) AS v4 FROM purchases GROUP BY 1, 2
),
dense AS (
  SELECT cs.cohort, cs.n_users, a.age
  FROM cohort_size cs CROSS JOIN horizon h,
       unnest(generate_series(0,
         CAST(datediff('day', cs.cohort, h.max_week) / 7 AS BIGINT))) AS a(age)
),
cum AS (
  SELECT d.cohort, d.age, d.n_users,
         SUM(COALESCE(c.v4, 0)) OVER (
           PARTITION BY d.cohort ORDER BY d.age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum4
  FROM dense d LEFT JOIN cells c ON d.cohort = c.cohort AND d.age = c.age
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, age, n_users,
       {sql_round('cum4 / 1e4 / n_users', 4)} AS ltv_per_user
FROM cum ORDER BY cohort, age
"""


@register("cohort_ltv_curve", oracle=_B99_ORACLE)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users cohorted by first-event week,
    cumulative purchase value per user by week-age, each cohort
    observed only to its own horizon (the ragged edge) — the
    unit-economics complement of B8's retention triangle and B82's
    growth accounting.

    Scale shape: one user-grain MIN aggregate (cohorts), one purchase
    aggregate to (cohort, age) cells; the dense age grid explodes from
    the |cohorts|-row dim against a 1-row horizon scalar, and the
    cumulative window runs on that dimension-scale frame. Values in
    exact 1e-4 integer units until the final division.
    """
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        monday_of(F.min("ts")).alias("cohort")
    )
    horizon = ev.agg(monday_of(F.max("ts")).alias("max_week"))
    cohort_size = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            "cohort",
            (F.datediff(monday_of(F.col("ts")), F.col("cohort")) / 7)
            .cast("bigint")
            .alias("age"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v4"),
        )
    )
    cells = purchases.groupBy("cohort", "age").agg(F.sum("v4").alias("v4"))
    dense = (
        cohort_size.transform(scalars(horizon))
        .select(
            "cohort",
            "n_users",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.datediff("max_week", F.col("cohort")) / 7).cast(
                        "bigint"
                    ),
                )
            ).alias("age"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        dense.join(cells, ["cohort", "age"], "left")
        .select(
            "cohort",
            "age",
            "n_users",
            F.sum(F.coalesce("v4", F.lit(0))).over(w_cum).alias("cum4"),
        )
    )
    return cum.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "age",
        "n_users",
        round_eps(F.col("cum4") / 1e4 / F.col("n_users"), 4).alias(
            "ltv_per_user"
        ),
    ).orderBy("cohort", "age")


# ---------------------------------------------------------------- C111

BLOCK_TERMS = ("slow", "big", "stream")  # word-boundary blocklist


_BLOCK_IN = ", ".join(f"'{t}'" for t in BLOCK_TERMS)

_C111_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         len(list_filter({sql_tokens('text')}, t -> t IN ({_BLOCK_IN})))
           AS n_hits,
         list_sort(list_distinct(
           list_filter({sql_tokens('text')}, t -> t IN ({_BLOCK_IN}))))
           AS hits
  FROM documents
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       CASE WHEN n_hits > 0 THEN hits[1] END AS first_term,
       CASE WHEN n_hits = 0 THEN 1 ELSE 0 END AS keep
FROM scored ORDER BY doc_id
"""


@register("blocklist_filter", oracle=_C111_ORACLE)
def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-token blocklist content filter with an audit trail
    (hit count + first matched term) — the unsafe-content gate of the
    corpus cascade, next to C20's PII scrub (regex redaction) and
    C27's quality gate. Exact token membership, not substring: 'bigram'
    must NOT trip 'big'.

    Scale shape: pure per-row array expressions — tokenise, filter
    against a {len(BLOCK_TERMS)}-term literal set, count + pick — ZERO
    shuffles, fully codegen; the blocklist scales to millions of terms
    by swapping the literal for a broadcast join at token grain.
    """
    toks = tokens(F.col("text"))
    hits = F.array_sort(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*BLOCK_TERMS)))
    )
    n_hits = F.size(F.filter(toks, lambda t: t.isin(*BLOCK_TERMS)))
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            n_hits.cast("bigint").alias("n_hits"),
            F.when(n_hits > 0, F.element_at(hits, 1)).alias("first_term"),
            F.when(n_hits == 0, 1).otherwise(0).alias("keep"),
        )
        .orderBy("doc_id")
    )
