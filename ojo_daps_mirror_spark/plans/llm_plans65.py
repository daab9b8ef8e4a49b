"""Sixty-fifth sweep (SURVEY.md §2 B120-B121, C136).

Small-file compaction planning by first-fit-decreasing bin packing
(the maintenance job every long-lived partitioned lake needs — B106's
LPT balances FIXED shards, FFD opens bins to a capacity), exact
weighted median (the quantity-weighted price statistic the unweighted
B95 median mis-states), and a MinHash perturbation-robustness audit
(does C5's banding still catch a doc after a 20% truncation edit? —
the robustness number behind the dedup family's recall claims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    hash64,
    raw_shingles,
    shingles,
    sql_hash64,
    sql_shingles,
    sql_tokens,
    tokens,
)
from ..sources import load_table
from . import register
from .text_plans import (
    MH_A,
    MH_B,
    MH_PERMS,
    MH_PRIME,
    MH_ROWS_PER_BAND,
    MH_SHINGLE_K,
    _MH_A_SQL,
    _MH_B_SQL,
)

# ---------------------------------------------------------------- B120

FFD_CAP_PCT = 250  # bin capacity = 250% of the largest file


def _b120_oracle() -> str:
    idx = (
        "COALESCE(list_filter(range(1, len(acc) + 1),"
        " i -> acc[i].load + x[1].load <= cap)[1], 0)"
    )
    step = f"""
      CASE WHEN {idx} > 0 THEN
        list_transform(acc, (b, i) -> CASE WHEN i = {idx}
          THEN struct_pack(load := b.load + x[1].load, nf := b.nf + 1)
          ELSE b END)
      ELSE list_transform(acc, b -> b) || [x[1]] END
    """
    return f"""
WITH weekly AS (
  SELECT DATE_TRUNC('week', l_shipdate) AS wk,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
ordered AS (
  SELECT list(struct_pack(load := cnt, nf := CAST(1 AS BIGINT))
              ORDER BY cnt DESC, wk) AS fs,
         CAST(CEIL(MAX(cnt) * {FFD_CAP_PCT} / 100.0) AS BIGINT) AS cap
  FROM weekly
),
folded AS (
  SELECT cap, list_reduce(
    [[]::STRUCT(load BIGINT, nf BIGINT)[]]
      || list_transform(fs, f -> [f]),
    (acc, x) -> {step}) AS st
  FROM ordered
)
SELECT CAST(p.i AS BIGINT) AS bin, p.b.nf AS n_files,
       p.b.load AS total_rows, cap AS capacity,
       {sql_round('p.b.load * 1.0 / cap', 4)} AS utilization
FROM (
  SELECT unnest(list_transform(st, (b, i) -> struct_pack(i := i, b := b)))
           AS p, cap
  FROM folded
)
ORDER BY bin
"""


@register("compaction_plan", oracle=_b120_oracle())
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan by first-fit-decreasing bin packing:
    weekly lineitem partition sizes (row counts standing in for file
    bytes), largest first, each into the first bin with room under a
    capacity of 250% of the largest file — FFD packs within 11/9·OPT+1
    bins, and is THE standard algorithm behind every lake-house
    OPTIMIZE/compaction job (B108 plans which ranges to backfill;
    this plans how to merge them; B106's LPT balances a FIXED shard
    count instead). Output: per target file, source-file count, rows,
    capacity and utilization.

    Scale shape: file stats collapse to |weeks| rows in one
    aggregate; the inherently-sequential FFD scan folds INSIDE one
    array expression over the collapsed row (B98/C120/C131's recipe)
    with the capacity captured as a row column — no driver loop, all
    exact BIGINTs. The fold is O(files·bins); for a 100 TB lake you
    run it per partition-family, never globally.
    """
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("week", F.col("l_shipdate")).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ordered = weekly.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("cnt")).alias("o"), "wk", "cnt"))
        ).alias("fs0"),
        F.ceil(F.max("cnt") * FFD_CAP_PCT / 100.0).cast("bigint").alias("cap"),
    ).select(
        F.transform(
            "fs0",
            lambda s: F.struct(
                s["cnt"].alias("load"), F.lit(1).cast("bigint").alias("nf")
            ),
        ).alias("fs"),
        "cap",
    )

    def step(acc, x):
        # NB: Spark's sequence(1, 0) DESCENDS ([1, 0]) when acc is empty,
        # so the fit probe must tolerate out-of-range indices.
        fits = lambda i: F.coalesce(  # noqa: E731
            F.try_element_at(acc, i.cast("int"))["load"] + x["load"]
            <= F.col("cap"),
            F.lit(False),
        )
        idx = F.coalesce(
            F.try_element_at(
                F.filter(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(acc), F.lit(1))
                    ),
                    fits,
                ),
                F.lit(1),
            ),
            F.lit(0),
        )
        grown = F.transform(
            acc,
            lambda b, i: F.when(
                i == idx - 1,
                F.struct(
                    (b["load"] + x["load"]).alias("load"),
                    (b["nf"] + 1).alias("nf"),
                ),
            ).otherwise(b),
        )
        return F.when(idx > 0, grown).otherwise(F.concat(acc, F.array(x)))

    empty = F.expr("CAST(array() AS array<struct<load:bigint,nf:bigint>>)")
    folded = ordered.select(
        "cap", F.aggregate(F.col("fs"), empty, step).alias("st")
    )
    return (
        folded.select("cap", F.posexplode("st").alias("pos", "b"))
        .select(
            (F.col("pos") + 1).cast("bigint").alias("bin"),
            F.col("b.nf").alias("n_files"),
            F.col("b.load").alias("total_rows"),
            F.col("cap").alias("capacity"),
            round_eps(F.col("b.load") * 1.0 / F.col("cap"), 4).alias(
                "utilization"
            ),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------- B121

_B121_ORACLE = f"""
WITH grouped AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, cents, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY flag) AS totw
  FROM grouped
)
SELECT flag, CAST(totw AS BIGINT) AS total_weight,
       {sql_round('MIN(cents) / 100.0', 2)} AS weighted_median
FROM cum WHERE 2 * cumw >= totw
GROUP BY flag, totw ORDER BY flag
"""


@register("weighted_median", oracle=_B121_ORACLE)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag: the
    smallest price whose cumulative quantity weight reaches half the
    total — what "median price" SHOULD mean when a line of 50 units
    must count 50× an single-unit line (B95's unweighted median
    answers a different question; surveys, revenue and inventory
    stats all need the weighted form). Lower-weighted-median rule,
    all arithmetic in exact integer cents × integer units.

    Scale shape: collapse to (flag, distinct-cents) grain in one
    aggregate first — the cumulative window then runs over the
    DISTINCT price scale (bounded by cent quantisation), not the fact
    stream, which also makes intra-tie ordering a non-issue. At
    100 TB swap the exact scan for approx_percentile with weight
    expansion only if the price scale itself explodes.
    """
    grouped = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    )
    wcum = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("flag")
    cum = grouped.select(
        "flag",
        "cents",
        F.sum("w").over(wcum).alias("cumw"),
        F.sum("w").over(wtot).alias("totw"),
    )
    return (
        cum.where(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("flag", "totw")
        .agg(round_eps(F.min("cents") / 100.0, 2).alias("weighted_median"))
        .select(
            "flag",
            F.col("totw").cast("bigint").alias("total_weight"),
            "weighted_median",
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------- C136

PERTURB_KEEP_PCT = 80  # truncation edit: keep the first 80% of tokens


def _mh_sql(sh: str) -> str:
    """Per-doc 8-slot minhash array from a shingle-list SQL expr."""
    return (
        f"list_transform(range(0, {MH_PERMS}), p -> "
        f"list_min(list_transform({sh}, s -> "
        f"({_MH_A_SQL}[p + 1] * ({sql_hash64('s')} & 2147483647)"
        f" + {_MH_B_SQL}[p + 1]) % {MH_PRIME})))"
    )


_C136_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, source,
         {sql_tokens('text')} AS toks
  FROM documents
),
variants AS (
  SELECT doc_id, source,
         {sql_shingles('toks', MH_SHINGLE_K)} AS sh_f,
         {sql_shingles(
             f"toks[1:CAST(FLOOR(len(toks) * {PERTURB_KEEP_PCT} / 100.0)"
             " AS BIGINT)]",
             MH_SHINGLE_K,
         )} AS sh_t
  FROM docs
),
sigs AS (
  SELECT doc_id, source,
         {_mh_sql('sh_f')} AS mh_f,
         {_mh_sql('sh_t')} AS mh_t
  FROM variants WHERE len(sh_t) > 0
),
per_doc AS (
  SELECT source,
         len(list_filter(range(0, {MH_PERMS}),
             p -> mh_f[p + 1] = mh_t[p + 1])) AS slots,
         len(list_filter(range(0, {MH_PERMS // MH_ROWS_PER_BAND}), b ->
             mh_f[{MH_ROWS_PER_BAND} * b + 1] = mh_t[{MH_ROWS_PER_BAND} * b + 1]
             AND mh_f[{MH_ROWS_PER_BAND} * b + 2]
                 = mh_t[{MH_ROWS_PER_BAND} * b + 2])) AS bands
  FROM sigs
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round(f'AVG(slots) / {MH_PERMS}', 6)} AS avg_slot_overlap,
       {sql_round(f'AVG(bands) / {MH_PERMS // MH_ROWS_PER_BAND}', 6)}
         AS avg_band_retention,
       {sql_round(
           'SUM(CASE WHEN bands >= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)',
           6)} AS frac_still_candidate
FROM per_doc GROUP BY source ORDER BY source
"""


def _h31_spark(sh) -> F.Column:
    """One md5 per shingle. Kept as its OWN projected column by the
    caller: inlining it under the 8 per-perm array_mins re-evaluates
    the md5 transform per perm (CollapseProject refuses to share a
    non-cheap expression referenced 8 times only across ADJACENT
    projects — an inlined lambda subtree gets no sharing at all), the
    same once-as-a-column trick text_plans.minhash_bands documents."""
    return F.transform(sh, lambda s: hash64(s).bitwiseAND(F.lit(2147483647)))


def _mh_from_h31(h31s) -> F.Column:
    return F.array(
        *[
            F.array_min(
                F.transform(
                    h31s,
                    lambda h: (F.lit(MH_A[p]) * h + F.lit(MH_B[p])) % MH_PRIME,
                )
            )
            for p in range(MH_PERMS)
        ]
    )


@register("minhash_perturbation_audit", oracle=_C136_ORACLE)
def minhash_perturbation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robustness audit of C5's MinHash banding under a realistic
    edit: truncate each doc to its first 80% of tokens (the
    boilerplate-footer-dropped / crawl-cutoff edit) and measure, per
    source, how much of the signature survives — average minhash-slot
    overlap, average band retention, and the fraction of docs that
    would STILL collide with their original in ≥1 band (i.e. the
    probability the dedup pipeline catches the edited duplicate).
    This turns C5's banding parameters from faith into a measured
    recall-under-edit number, per source — the audit behind C76's
    recall eval, without needing labelled pairs.

    Scale shape: pure map-side — both variants' shingles, h31
    materialisation and all 8 affine minhashes are projections of the
    same row (the exploded-truncated text never leaves the task); the
    only shuffle is the final |sources| aggregate. Exactly C5's
    signature recipe (text_plans.minhash_bands), so the audit
    measures the REAL pipeline's constants.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    )
    keep = F.floor(F.size("toks") * PERTURB_KEEP_PCT / 100.0).cast("int")
    # POSITIONAL shingles, hashed ONCE: the truncated variant's shingle
    # list is a strict PREFIX of the full one (truncation removes
    # trailing tokens only), so its h31 list is a slice of the full
    # list — no second shingle pass, no second md5 pass. The distinct
    # the old form applied is irrelevant to every downstream number:
    # minhash slots are array_min over the hashes (duplicates never
    # move a min), and the size(sh_t) > 0 keep-filter is equivalent to
    # the positional prefix being non-empty.
    t_len = F.greatest(
        keep - F.lit(MH_SHINGLE_K - 1), F.lit(0)
    )
    hashed = docs.select(
        "source",
        _h31_spark(raw_shingles(F.col("toks"), MH_SHINGLE_K)).alias("h_f"),
        t_len.alias("t_len"),
    ).where(F.col("t_len") > 0).select(
        "source",
        "h_f",
        F.slice(F.col("h_f"), 1, F.col("t_len")).alias("h_t"),
    )
    sigs = hashed.select(
        "source",
        _mh_from_h31(F.col("h_f")).alias("mh_f"),
        _mh_from_h31(F.col("h_t")).alias("mh_t"),
    )
    slots = F.size(
        F.filter(
            F.sequence(F.lit(0), F.lit(MH_PERMS - 1)),
            lambda p: F.element_at(F.col("mh_f"), p.cast("int") + 1)
            == F.element_at(F.col("mh_t"), p.cast("int") + 1),
        )
    )
    n_bands = MH_PERMS // MH_ROWS_PER_BAND
    bands = F.size(
        F.filter(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: (
                F.element_at(
                    F.col("mh_f"), (MH_ROWS_PER_BAND * b + 1).cast("int")
                )
                == F.element_at(
                    F.col("mh_t"), (MH_ROWS_PER_BAND * b + 1).cast("int")
                )
            )
            & (
                F.element_at(
                    F.col("mh_f"), (MH_ROWS_PER_BAND * b + 2).cast("int")
                )
                == F.element_at(
                    F.col("mh_t"), (MH_ROWS_PER_BAND * b + 2).cast("int")
                )
            ),
        )
    )
    per_doc = sigs.select(
        "source", slots.alias("slots"), bands.alias("bands")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            round_eps(F.avg("slots") / MH_PERMS, 6).alias("avg_slot_overlap"),
            round_eps(F.avg("bands") / n_bands, 6).alias(
                "avg_band_retention"
            ),
            round_eps(
                F.sum(F.when(F.col("bands") >= 1, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("frac_still_candidate"),
        )
        .orderBy("source")
    )
