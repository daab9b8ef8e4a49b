"""Forty-seventh sweep (SURVEY.md §2 B96, C107-C108).

Holt-Winters triple exponential smoothing (completing the B48 EWMA /
B69 Holt smoothing family with seasonal state), asymmetric shingle
CONTAINMENT dedup (the quote/excerpt detector Jaccard misses), and a
deterministic language-interleaved curriculum schedule for training
data ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    hash64,
    shingles,
    sql_hash64,
    sql_shingles,
    sql_tokens,
    tokens,
)
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B96

HW_ALPHA = 0.3  # level gain
HW_BETA = 0.2  # trend gain
HW_GAMMA = 0.1  # seasonal gain
HW_PERIOD = 7  # daily series, weekly seasonality
HW_YEAR = 2000  # one calendar year of days keeps the fold dimension-scale


def _hw_step_sql() -> str:
    """One Holt-Winters additive update on the 9-wide state
    [level, trend, s_{t-7}..s_{t-1}] — mirror of the Spark fold,
    addend for addend. acc[3] is the oldest seasonal (consumed and
    shifted out this step)."""
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    nl = f"{a!r} * (p[1] - acc[3]) + {1 - a!r} * (acc[1] + acc[2])"
    nt = f"{b!r} * (({nl}) - acc[1]) + {1 - b!r} * acc[2]"
    ns = f"{g!r} * (p[1] - ({nl})) + {1 - g!r} * acc[3]"
    return f"[{nl}, {nt}] || acc[4:9] || [{ns}]"


_B96_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate::DATE AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE year(o_orderdate) = {HW_YEAR} GROUP BY 1
),
folded AS (
  SELECT day, n,
         list_transform(
           list(CAST(n AS DOUBLE)) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ),
           x -> [x, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) AS ps
  FROM daily
),
state AS (
  SELECT day, n, list_reduce(ps, (acc, p) -> {_hw_step_sql()}) AS st
  FROM folded
)
SELECT strftime(day, '%Y-%m-%d') AS day, n,
       {sql_round('st[1]', 6)} AS level,
       {sql_round('st[2]', 6)} AS trend,
       {sql_round('st[9]', 6)} AS seasonal,
       {sql_round('st[1] + st[2] + st[3]', 6)} AS forecast_next
FROM state ORDER BY day
"""


@register("holt_winters_daily", oracle=_B96_ORACLE)
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing of the daily order
    series (period {HW_PERIOD} = weekly seasonality): level + trend +
    a rotating {HW_PERIOD}-slot seasonal buffer per day, and the
    one-step-ahead forecast level+trend+s_{{t+1-7}} — the
    seasonality-aware member of the B48 (EWMA) / B69 (Holt) smoothing
    family, i.e. B49's decomposition running as an online filter.

    Exactness recipe is B69's: a recursive filter has no mergeable
    form, so the corpus reduces to |days| rows FIRST (one aggregate),
    then both engines fold the identical 9-wide state list in the
    identical order — bit-equal doubles. DuckDB's list_reduce seeds
    from the first element, so the padded first element
    [x₁,0,...,0] IS the initial state in both engines (level=x₁,
    zero trend, zero seasonals).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == HW_YEAR)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ps = F.transform(
        F.collect_list(F.col("n").cast("double")).over(w),
        lambda x: F.concat(F.array(x), F.array_repeat(F.lit(0.0), 8)),
    )
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA

    def step(acc, p):
        x = F.element_at(p, 1)
        lv, tr, sm = (F.element_at(acc, i) for i in (1, 2, 3))
        nl = a * (x - sm) + (1 - a) * (lv + tr)
        nt = b * (nl - lv) + (1 - b) * tr
        ns = g * (x - nl) + (1 - g) * sm
        return F.concat(F.array(nl, nt), F.slice(acc, 4, 6), F.array(ns))

    folded = daily.select("day", "n", ps.alias("ps"))
    st = F.aggregate(
        F.slice(F.col("ps"), 2, F.greatest(F.size("ps") - 1, F.lit(0))),
        F.element_at(F.col("ps"), 1),
        step,
    )
    return folded.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        round_eps(F.element_at(st, 1), 6).alias("level"),
        round_eps(F.element_at(st, 2), 6).alias("trend"),
        round_eps(F.element_at(st, 9), 6).alias("seasonal"),
        round_eps(
            F.element_at(st, 1) + F.element_at(st, 2) + F.element_at(st, 3), 6
        ).alias("forecast_next"),
    ).orderBy("day")


# ---------------------------------------------------------------- C107

CONT_SHINGLE_K = 3  # verification shingles
CONT_BLOCK_K = 5  # blocking shingles (rarer → tiny postings)
CONT_DF_CAP = 100  # posting-list skew guard (mirrored in the oracle)
CONT_T = 0.8  # containment threshold


_C107_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           {sql_shingles(sql_tokens('text'), CONT_SHINGLE_K)},
           s -> {sql_hash64('s')})) AS sh
  FROM documents
),
blocks AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), CONT_BLOCK_K)} AS bh
  FROM documents
),
ex AS (SELECT doc_id, unnest(bh) AS s FROM blocks),
df AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {CONT_DF_CAP}),
indexed AS (SELECT ex.doc_id, ex.s FROM ex JOIN df USING (s)),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM indexed a JOIN indexed b ON a.s = b.s AND a.doc_id <> b.doc_id
),
scored AS (
  SELECT i AS contained, j AS container,
         len(list_intersect(da.sh, db.sh)) AS n_shared,
         len(da.sh) AS n_a,
         len(list_intersect(da.sh, db.sh)) * 1.0 / len(da.sh) AS cont
  FROM cand
  JOIN docs da ON i = da.doc_id
  JOIN docs db ON j = db.doc_id
  WHERE len(da.sh) > 0
)
SELECT contained, container, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_a AS BIGINT) AS n_a,
       {sql_round('cont', 4)} AS containment
FROM scored WHERE cont >= {CONT_T}
ORDER BY contained, container
"""


@register("containment_dedup", oracle=_C107_ORACLE)
def containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC shingle-containment near-dup detection
    (Broder's containment): C(A→B) = |sh(A)∩sh(B)| / |sh(A)| ≥
    {CONT_T} flags A as quoted/excerpted inside B — the
    subset-duplication case symmetric Jaccard (C7) structurally
    misses (a paragraph inside a long doc has tiny Jaccard but
    containment ≈ 1). Both directions of every candidate pair are
    scored, so (excerpt→source) and (source→excerpt) get their own
    asymmetric scores.

    Scale shape is C7's lossy-blocked verify: candidates from rare
    {CONT_BLOCK_K}-gram blocking shingles with a DF cap as the skew
    guard (cap mirrored in the oracle), ordered pairs expanded
    MAP-SIDE from each capped posting list, verification only on
    candidates via one sorted-array intersection per pair.
    """
    raw = load_table(spark, sf_dir, "documents")
    sh = F.array_distinct(
        F.transform(
            shingles(tokens(F.col("text")), CONT_SHINGLE_K), lambda s: hash64(s)
        )
    )
    ex = raw.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), CONT_BLOCK_K)).alias("s"),
    )
    posts = (
        ex.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= CONT_DF_CAP))
    )
    ds = F.col("ds")
    # ordered pairs BOTH ways: containment is asymmetric
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x: F.transform(
                F.filter(ds, lambda y: y != x),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    # _jaccard_verify's proven verify shape (text_plans.py): materialize
    # the tiny candidate frame once (it feeds two id semi-joins + the
    # pair join), SEMI-JOIN the id set BEFORE the per-doc shingle+md5
    # computation so the expensive hashed-shingle arrays are built for
    # candidate docs only (previously every document paid the md5 pass
    # TWICE — once per join side), and persist the shingled candidates
    # so both sides read one computation.
    cand = (
        posts.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
        .persist()
    )
    cand_ids = cand.select(
        F.explode(F.array("i", "j")).alias("doc_id")
    ).distinct()
    docs = (
        raw.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", F.array_sort(sh).alias("sh"))
        .where(F.size("sh") > 0)
        .persist()
    )
    da = docs.select(F.col("doc_id").alias("i"), F.col("sh").alias("sha"))
    db = docs.select(F.col("doc_id").alias("j"), F.col("sh").alias("shb"))
    scored = (
        cand.join(da, "i")
        .join(db.hint("broadcast"), "j")
        .select(
            F.col("i").alias("contained"),
            F.col("j").alias("container"),
            F.size(F.array_intersect("sha", "shb")).alias("n_shared"),
            F.size("sha").alias("n_a"),
        )
        .withColumn("cont", F.col("n_shared") * 1.0 / F.col("n_a"))
    )
    return (
        scored.where(F.col("cont") >= CONT_T)
        .select(
            "contained",
            "container",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            round_eps(F.col("cont"), 4).alias("containment"),
        )
        .orderBy("contained", "container")
    )


# ---------------------------------------------------------------- C108

_C108_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY n_chars, doc_id
         ) AS r,
         DENSE_RANK() OVER (ORDER BY lang) AS lr,
         (SELECT COUNT(DISTINCT lang) FROM documents) AS nl
  FROM documents
)
SELECT CAST((r - 1) * nl + lr AS BIGINT) AS position,
       doc_id, lang, n_chars
FROM ranked ORDER BY position
"""


@register("curriculum_interleave", oracle=_C108_ORACLE)
def curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule with language interleave:
    within each language docs order easy→hard (n_chars as the
    difficulty key, doc_id tie-break), and the global position strides
    languages round-robin (pos = (rank−1)·|langs| + lang_rank) so no
    language clumps — the reshard-stable, rand()-free training-order
    primitive next to C49's shard assignment and C79's split (Bengio
    et al. curriculum shape, the schedule itself deterministic).
    Positions are globally unique (strided residues per language);
    gaps appear once a language exhausts — harmless to a data loader
    that sorts by position.

    Scale shape: ONE per-language ranking window (distributes on the
    lang key; range-partitioned two-pass ranking is the 100 TB swap
    for giant languages, C38's note) + a broadcast |langs|-row rank
    dim; the stride arithmetic is pure codegen.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    # |langs| rides the SAME single-partition window pass over the tiny
    # distinct frame as the rank — never an eager langs.count() in the
    # query path (guide §5), which also replayed the docs scan.
    langs = (
        docs.select("lang")
        .distinct()
        .select(
            "lang",
            F.dense_rank().over(Window.orderBy("lang")).alias("lr"),
            F.count(F.lit(1))
            .over(
                Window.orderBy("lang").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("nl"),
        )
    )
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        docs.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(langs), "lang")
        .select(
            ((F.col("r") - 1) * F.col("nl") + F.col("lr"))
            .cast("bigint")
            .alias("position"),
            "doc_id",
            "lang",
            "n_chars",
        )
        .orderBy("position")
    )
