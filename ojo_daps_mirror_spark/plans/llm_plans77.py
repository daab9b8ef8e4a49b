"""Seventy-seventh sweep (SURVEY.md §2 B140-B141, C152).

Croston's intermittent-demand forecast (the SES variant that's
actually CORRECT for sparse demand series, where plain smoothing
(B96) biases toward zero), Kendall's tau-b rank correlation via 2D
contingency-grid prefix sums (the O(n²)-pairs statistic computed
with two windows over a bounded grid), and a mojibake/encoding
quality audit (replacement chars, control chars, non-ASCII mass —
the corpus-health numbers a crawl ingest gate reads first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B140

CROSTON_ALPHA = 0.1
CROSTON_MIN_OCC = 3

_B140_ORACLE = f"""
WITH demand AS (
  SELECT l_partkey AS p,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l_shipdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
series AS (
  SELECT p,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         list(w ORDER BY w) AS ws,
         list_transform(list(q ORDER BY w), x -> CAST(x AS DOUBLE)) AS qs
  FROM demand GROUP BY p
  HAVING COUNT(*) >= {CROSTON_MIN_OCC}
),
folded AS (
  SELECT p, n_occ,
         list_reduce(qs,
           (a, x) -> {CROSTON_ALPHA!r} * x + {1 - CROSTON_ALPHA!r} * a)
           AS z,
         list_reduce(
           list_transform(list_slice(ws, 2, len(ws)),
                          (x, i) -> CAST(x - ws[i] AS DOUBLE)),
           (a, x) -> {CROSTON_ALPHA!r} * x + {1 - CROSTON_ALPHA!r} * a)
           AS iv
  FROM series
)
SELECT p AS partkey, n_occ,
       {sql_round('z', 6)} AS smoothed_size,
       {sql_round('iv', 6)} AS smoothed_interval,
       {sql_round('z / iv', 6)} AS demand_rate
FROM folded ORDER BY partkey
"""


@register("croston_forecast", oracle=_B140_ORACLE)
def croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per part: separate
    exponential smoothing (α={CROSTON_ALPHA}) of nonzero demand SIZES
    and of the INTERVALS between demand weeks, demand rate = z/i.
    For sparse series — most part-weeks have zero demand — plain SES
    (B96) biases toward zero right after each demand spike; Croston
    is the standard fix in supply-chain forecasting.

    Scale shape: one fact-grain aggregate to (part, week) demand,
    one part-grain collect of the (bounded-length) nonzero series,
    then both smoothings run as in-expression left folds over the
    sorted arrays (no driver loop, no per-part UDF — B98's
    fold-the-recurrence recipe). Folds evaluate in identical element
    order in both engines, so the doubles agree.
    """
    wk = F.floor(
        F.datediff(
            F.date_trunc("week", F.col("l_shipdate")), F.lit("1970-01-05")
        )
        / 7
    ).cast("bigint")
    demand = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("p"), wk.alias("w"))
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    series = (
        demand.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.array_sort(
                F.collect_list(F.struct("w", "q"))
            ).alias("swq"),
        )
        .where(F.col("n_occ") >= CROSTON_MIN_OCC)
        .select(
            "p",
            "n_occ",
            F.transform(F.col("swq"), lambda s: s["w"]).alias("ws"),
            F.transform(
                F.col("swq"), lambda s: s["q"].cast("double")
            ).alias("qs"),
        )
    )
    a1, a0 = F.lit(CROSTON_ALPHA), F.lit(1 - CROSTON_ALPHA)
    ws, qs = F.col("ws"), F.col("qs")
    ses = lambda arr: F.aggregate(  # noqa: E731
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: a1 * x + a0 * acc,
    )
    intervals = F.transform(
        F.slice(ws, 2, F.size(ws) - 1),
        lambda x, i: (x - F.element_at(ws, i + 1)).cast("double"),
    )
    folded = series.select(
        "p",
        "n_occ",
        ses(qs).alias("z"),
        ses(intervals).alias("iv"),
    )
    return folded.select(
        F.col("p").alias("partkey"),
        "n_occ",
        round_eps(F.col("z"), 6).alias("smoothed_size"),
        round_eps(F.col("iv"), 6).alias("smoothed_interval"),
        round_eps(F.col("z") / F.col("iv"), 6).alias("demand_rate"),
    ).orderBy("partkey")


# ---------------------------------------------------------------- B141

_B141_ORACLE = f"""
WITH joined AS (
  SELECT p.p_size AS x, CAST(ROUND(l.l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n
  FROM joined GROUP BY x, y
),
colcum AS (
  SELECT x, y, n,
         CAST(COALESCE(SUM(n) OVER (PARTITION BY y ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS bx
  FROM cells
),
grid AS (
  SELECT x, y, n,
         CAST(COALESCE(SUM(bx) OVER (PARTITION BY x ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS conc_lt,
         CAST(COALESCE(SUM(bx) OVER (PARTITION BY x ORDER BY y DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS disc_gt
  FROM colcum
),
marg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(n * conc_lt) AS BIGINT) AS conc,
         CAST(SUM(n * disc_gt) AS BIGINT) AS disc
  FROM grid
),
tx AS (
  SELECT CAST(SUM(nx * (nx - 1) / 2) AS BIGINT) AS t1 FROM (
    SELECT CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY x)
),
ty AS (
  SELECT CAST(SUM(ny * (ny - 1) / 2) AS BIGINT) AS t2 FROM (
    SELECT CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY y)
)
SELECT m.nn AS n_rows, m.conc AS concordant, m.disc AS discordant,
       {sql_round(
           '(m.conc - m.disc) * 1.0'
           ' / sqrt((m.nn * (m.nn - 1.0) / 2 - t1)'
           '        * (m.nn * (m.nn - 1.0) / 2 - t2))', 6)} AS tau_b
FROM marg m CROSS JOIN tx CROSS JOIN ty
"""


@register("kendall_tau_b", oracle=_B141_ORACLE)
def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (tie-corrected) between part size and order
    quantity — the rank correlation whose naive form is O(n²) PAIRS,
    computed exactly by collapsing the facts onto the bounded
    (size × quantity) contingency grid and reading concordant /
    discordant counts off 2D prefix sums: per-cell "strictly smaller
    in both dims" mass via a column cumsum (partition y, order x)
    then a row cumsum (partition x, order y), discordant via the
    y-descending twin. Complements Pearson (B45) and Spearman-adjacent
    rank machinery (B91/B134) with the concordance-based coefficient.

    Scale shape: one broadcast dim join, one aggregate to the
    bounded grid (|sizes|·|quantities| cells, corpus-size
    independent), two window passes over the grid, one reduction —
    every count an exact BIGINT. The O(n²) pair space never
    materializes.
    """
    joined = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", F.round(F.col("l_quantity")).cast("bigint").alias("y"))
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    "p_partkey", F.col("p_size").alias("x")
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    cells = joined.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cells = cells.persist()
    w_colcum = (
        Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    colcum = cells.select(
        "x",
        "y",
        "n",
        F.coalesce(F.sum("n").over(w_colcum), F.lit(0))
        .cast("bigint")
        .alias("bx"),
    )
    w_up = (
        Window.partitionBy("x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_down = (
        Window.partitionBy("x")
        .orderBy(F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = colcum.select(
        "n",
        F.coalesce(F.sum("bx").over(w_up), F.lit(0))
        .cast("bigint")
        .alias("conc_lt"),
        F.coalesce(F.sum("bx").over(w_down), F.lit(0))
        .cast("bigint")
        .alias("disc_gt"),
    )
    marg = grid.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.col("n") * F.col("conc_lt")).cast("bigint").alias("conc"),
        F.sum(F.col("n") * F.col("disc_gt")).cast("bigint").alias("disc"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").cast("bigint").alias("nx"))
        .agg(
            F.sum(F.col("nx") * (F.col("nx") - 1) / 2)
            .cast("bigint")
            .alias("t1")
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").cast("bigint").alias("ny"))
        .agg(
            F.sum(F.col("ny") * (F.col("ny") - 1) / 2)
            .cast("bigint")
            .alias("t2")
        )
    )
    nn = F.col("nn")
    n0 = nn * (nn - 1.0) / 2
    return (
        marg.transform(scalars(tx))
        .transform(scalars(ty))
        .select(
            nn.alias("n_rows"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            round_eps(
                (F.col("conc") - F.col("disc"))
                * 1.0
                / F.sqrt((n0 - F.col("t1")) * (n0 - F.col("t2"))),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------- C152

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"

_C152_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
              AS BIGINT) AS n_nonascii,
         CASE WHEN strpos(text, chr(65533)) > 0 THEN 1 ELSE 0 END
           AS has_replacement,
         CASE WHEN regexp_matches(text, '{_CTRL_RE}') THEN 1 ELSE 0 END
           AS has_control
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(has_replacement) AS BIGINT) AS n_docs_replacement,
       CAST(SUM(has_control) AS BIGINT) AS n_docs_control,
       {sql_round('SUM(has_replacement) * 100.0 / COUNT(*)', 4)}
         AS pct_docs_replacement,
       {sql_round('SUM(n_nonascii) * 100.0 / SUM(n_chars)', 4)}
         AS pct_nonascii_chars
FROM per_doc GROUP BY source ORDER BY source
"""


@register("mojibake_audit", oracle=_C152_ORACLE)
def mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health audit per source: U+FFFD replacement-char
    incidence (the smoking gun of a botched decode), raw control
    characters, and corpus-mass non-ASCII percentage — the first
    numbers a crawl-ingest gate reads, upstream of C2's linguistic
    quality score (a perfectly fluent doc with replacement chars is
    still a decode bug, and non-ASCII mass separates "foreign
    language" from "binary junk" when read next to C3's lang-id).

    Scale shape: pure map-side expression work (length arithmetic +
    regex containment per doc, whole-stage codegen) into one
    |sources|-key aggregate. No explode, no UDF, nothing leaves the
    JVM.
    """
    text = F.col("text")
    per_doc = load_table(spark, sf_dir, "documents").select(
        "source",
        F.length(text).cast("bigint").alias("n_chars"),
        (
            F.length(text)
            - F.length(F.regexp_replace(text, "[^\\x00-\\x7F]", ""))
        )
        .cast("bigint")
        .alias("n_nonascii"),
        F.when(F.instr(text, "�") > 0, 1)
        .otherwise(0)
        .alias("has_replacement"),
        F.when(F.regexp_like(text, F.lit(_CTRL_RE)), 1)
        .otherwise(0)
        .alias("has_control"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("has_replacement")
            .cast("bigint")
            .alias("n_docs_replacement"),
            F.sum("has_control").cast("bigint").alias("n_docs_control"),
            round_eps(
                F.sum("has_replacement") * 100.0 / F.count(F.lit(1)), 4
            ).alias("pct_docs_replacement"),
            round_eps(
                F.sum("n_nonascii") * 100.0 / F.sum("n_chars"), 4
            ).alias("pct_nonascii_chars"),
        )
        .orderBy("source")
    )
