"""Sixty-sixth sweep (SURVEY.md §2 B122-B123, C137).

Hilbert-curve space-filling keys with a measured locality audit
against B42's Morton/Z-order (the data-layout choice that decides how
many files a spatial range scan touches), a range-partitioner planner
from exact order statistics (what Spark's RangePartitioner samples
for, computed exactly and audited for balance), and Fano-factor
burstiness of the event stream (is arrival Poisson or bursty — the
number that sizes stream buffers and autoscaling headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B122

HB_BITS = 6  # 64×64 grid
HB_N = 1 << HB_BITS


def _hb_morton_sql(xi: str, yi: str) -> str:
    terms = []
    for b in range(HB_BITS):
        terms.append(f"((({xi} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({yi} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


def _b122_oracle() -> str:
    # Packed-BIGINT fold state (d·N² + x·N + y): DuckDB 1.0.0's
    # list_reduce mutates struct accumulators field-by-field IN PLACE,
    # so the classic x/y swap reads the already-overwritten x (same
    # family as the C131 list-concat aliasing bug). A single scalar
    # state has no cross-field reads, so it is aliasing-proof — and the
    # Spark side uses the identical packing so the formulas can't drift.
    s_list = ", ".join(str(HB_N >> (i + 1)) for i in range(HB_BITS))
    x = f"((acc // {HB_N}) % {HB_N})"
    y = f"(acc % {HB_N})"
    d = f"(acc // {HB_N * HB_N})"
    rx = f"(CASE WHEN ({x} & s) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & s) > 0 THEN 1 ELSE 0 END)"
    nx = (
        f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
        f" THEN {HB_N - 1} - {y} ELSE {y} END ELSE {x} END)"
    )
    ny = (
        f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
        f" THEN {HB_N - 1} - {x} ELSE {x} END ELSE {y} END)"
    )
    nd = f"({d} + s * s * xor(3 * {rx}, {ry}))"
    step = f"({nd} * {HB_N * HB_N} + {nx} * {HB_N} + {ny})"
    hilbert = f"""(list_reduce(
      [CAST(xi * {HB_N} + yi AS BIGINT)] || [{s_list}]::BIGINT[],
      (acc, s) -> {step}) // {HB_N * HB_N})"""
    return f"""
WITH pts AS (
  SELECT 50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))::BIGINT
                 % 5000) / 1000.0 AS lat,
         -5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))::BIGINT
                 % 10000) / 1000.0 AS lon
  FROM customer
),
cells AS (
  SELECT DISTINCT
         LEAST(CAST(FLOOR((lon + 5.0) / 10.0 * {HB_N}) AS BIGINT),
               {HB_N - 1}) AS xi,
         LEAST(CAST(FLOOR((lat - 50.0) / 5.0 * {HB_N}) AS BIGINT),
               {HB_N - 1}) AS yi
  FROM pts
),
keyed AS (
  SELECT xi, yi,
         CAST({_hb_morton_sql('xi', 'yi')} AS BIGINT) AS mk,
         CAST({hilbert} AS BIGINT) AS hk
  FROM cells
),
nbrs AS (
  SELECT a.mk AS mka, b.mk AS mkb, a.hk AS hka, b.hk AS hkb
  FROM keyed a JOIN keyed b
    ON (b.xi = a.xi + 1 AND b.yi = a.yi)
    OR (b.xi = a.xi AND b.yi = a.yi + 1)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keyed) AS n_cells,
       CAST(COUNT(*) AS BIGINT) AS n_neighbor_pairs,
       {sql_round('AVG(ABS(mka - mkb))', 4)} AS avg_morton_gap,
       {sql_round('AVG(ABS(hka - hkb))', 4)} AS avg_hilbert_gap,
       {sql_round('AVG(ABS(mka - mkb)) / AVG(ABS(hka - hkb))', 4)}
         AS locality_ratio
FROM nbrs
"""


def _hilbert_d(xi, yi) -> F.Column:
    # Identical packed-BIGINT fold as the oracle (see _b122_oracle).
    init = (xi.cast("bigint") * HB_N + yi.cast("bigint")).cast("bigint")
    svals = F.array(
        *[F.lit(HB_N >> (i + 1)).cast("bigint") for i in range(HB_BITS)]
    )

    def step(acc, s):
        x = F.floor(acc / HB_N) % HB_N
        y = acc % HB_N
        d = F.floor(acc / (HB_N * HB_N))
        rx = F.when(x.bitwiseAND(s) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(s) > 0, 1).otherwise(0)
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(HB_N - 1) - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(HB_N - 1) - x).otherwise(x)
        ).otherwise(y)
        nd = d + s * s * (3 * rx).bitwiseXOR(ry)
        return (nd * (HB_N * HB_N) + nx * HB_N + ny).cast("bigint")

    return F.floor(F.aggregate(svals, init, step) / (HB_N * HB_N)).cast(
        "bigint"
    )


@register("hilbert_key", oracle=_b122_oracle())
def hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert space-filling-curve keys for the customer point grid,
    with a MEASURED locality audit against B42's Morton/Z-order: for
    every pair of occupied 4-adjacent cells, the absolute key
    distance under each curve. Hilbert guarantees adjacent cells are
    never more than a bounded key distance apart (no Z-order "seam
    jumps" across quadrant boundaries), so a spatial range scan over
    Hilbert-sorted files touches fewer files — this query outputs the
    ratio that justifies choosing it for the data layout.

    Scale shape: key derivation is pure per-row integer bit math (the
    6-level xy2d rotation folds INSIDE one array expression —
    B98's recipe at its smallest); the audit joins the DISTINCT-cell
    frame (≤4096 rows) to its shifted self. At 100 TB the keys are a
    write-time projection, exactly like B42's zorder_key.
    """
    pts = load_table(spark, sf_dir, "customer").select(
        (
            50.0
            + (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("g"), F.col("c_custkey"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 5000
            )
            / 1000.0
        ).alias("lat"),
        (
            -5.0
            + (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("h"), F.col("c_custkey"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 10000
            )
            / 1000.0
        ).alias("lon"),
    )
    cells = pts.select(
        F.least(
            F.floor((F.col("lon") + 5.0) / 10.0 * HB_N).cast("bigint"),
            F.lit(HB_N - 1),
        ).alias("xi"),
        F.least(
            F.floor((F.col("lat") - 50.0) / 5.0 * HB_N).cast("bigint"),
            F.lit(HB_N - 1),
        ).alias("yi"),
    ).distinct()
    morton = sum(
        [
            (F.shiftleft(F.shiftright(F.col("xi"), b).bitwiseAND(1), 2 * b + 1))
            + (F.shiftleft(F.shiftright(F.col("yi"), b).bitwiseAND(1), 2 * b))
            for b in range(HB_BITS)
        ],
        F.lit(0),
    )
    keyed = cells.select(
        "xi",
        "yi",
        morton.cast("bigint").alias("mk"),
        _hilbert_d(F.col("xi"), F.col("yi")).cast("bigint").alias("hk"),
    )
    keyed = keyed.persist()
    b = keyed.select(
        F.col("xi").alias("bxi"),
        F.col("yi").alias("byi"),
        F.col("mk").alias("mkb"),
        F.col("hk").alias("hkb"),
    )
    nbrs = keyed.join(
        b,
        ((F.col("bxi") == F.col("xi") + 1) & (F.col("byi") == F.col("yi")))
        | ((F.col("bxi") == F.col("xi")) & (F.col("byi") == F.col("yi") + 1)),
    )
    n_cells = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    return nbrs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbor_pairs"),
        round_eps(F.avg(F.abs(F.col("mk") - F.col("mkb"))), 4).alias(
            "avg_morton_gap"
        ),
        round_eps(F.avg(F.abs(F.col("hk") - F.col("hkb"))), 4).alias(
            "avg_hilbert_gap"
        ),
        round_eps(
            F.avg(F.abs(F.col("mk") - F.col("mkb")))
            / F.avg(F.abs(F.col("hk") - F.col("hkb"))),
            4,
        ).alias("locality_ratio"),
    ).transform(scalars(n_cells)).select(
        "n_cells",
        "n_neighbor_pairs",
        "avg_morton_gap",
        "avg_hilbert_gap",
        "locality_ratio",
    )


# ---------------------------------------------------------------- B123

RP_BUCKETS = 32

_B123_ORACLE = f"""
WITH vals AS (
  SELECT CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (ORDER BY ROUND(o_totalprice * 100 + 1e-9),
                            o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
bset AS (
  SELECT CAST(CEIL(i * n * 1.0 / {RP_BUCKETS}) AS BIGINT) AS rk
  FROM (SELECT unnest(generate_series(1, {RP_BUCKETS - 1})) AS i)
       CROSS JOIN (SELECT MAX(n) AS n FROM vals)
),
bounds AS (
  SELECT list(v.cents ORDER BY v.cents) AS bnds
  FROM vals v JOIN bset ON v.rn = bset.rk
),
bucketed AS (
  SELECT v.cents,
         len(list_filter(b.bnds, x -> x <= v.cents)) AS bucket,
         v.n
  FROM vals v CROSS JOIN bounds b
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_round('MIN(cents) / 100.0', 2)} AS min_price,
       {sql_round('MAX(cents) / 100.0', 2)} AS max_price,
       {sql_round(f'COUNT(*) * {RP_BUCKETS}.0 / MAX(n)', 4)}
         AS balance_ratio
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@register("range_partition_plan", oracle=_B123_ORACLE)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner planning from EXACT order statistics: 31
    boundary values at ranks ⌈i·N/32⌉ over order price, then the
    per-bucket row count, range and balance ratio (count·32/N ≈ 1 for
    a perfect split). This is what Spark's RangePartitioner estimates
    by reservoir sampling before every sort/range-write — computed
    exactly, it audits how balanced a range layout (and any
    ORDER-BY-price output files) will be, and the same boundaries
    drive a repartitionByRange write. Companion to B42/B122 (which
    pick the ORDER); this picks the SPLITS.

    Scale shape: one global rank window (the same sort any range
    write needs anyway) marks the 31 boundary rows; boundaries
    collapse to a single array row that broadcasts, and bucket
    assignment is a map-side array count — no per-row join. At 100 TB
    swap the exact window for approx_percentile boundaries; the audit
    frame is identical. Executable via SPARK_GRAFT_SCALE_MODE=approx
    (scale_mode.py).
    """
    vals = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("cents"),
        "o_orderkey",
    )
    if sm.is_approx():
        # boundaries from ONE percentile_approx sketch over the scan —
        # no rank window, no total sort; the audit shape is unchanged
        qs = [i / RP_BUCKETS for i in range(1, RP_BUCKETS)]
        bounds = vals.agg(
            F.percentile_approx(
                "cents", F.lit(qs), F.lit(sm.APPROX_PERCENTILE_ACCURACY)
            ).alias("bnds"),
            F.count(F.lit(1)).alias("n"),
        )
        bucketed = vals.transform(scalars(bounds)).select(
            "cents",
            "n",
            F.size(
                F.filter(F.col("bnds"), lambda x: x <= F.col("cents"))
            ).alias("bucket"),
        )
        return (
            bucketed.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                round_eps(F.min("cents") / 100.0, 2).alias("min_price"),
                round_eps(F.max("cents") / 100.0, 2).alias("max_price"),
                round_eps(
                    F.count(F.lit(1)) * float(RP_BUCKETS) / F.max("n"), 4
                ).alias("balance_ratio"),
            )
            .orderBy("bucket")
        )
    w = Window.orderBy("cents", "o_orderkey")
    ranked = vals.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    ranked = ranked.persist()
    bset = (
        spark.range(1, RP_BUCKETS)
        .transform(scalars(ranked.agg(F.max("n").alias("nn"))))
        .select(
            F.ceil(F.col("id") * F.col("nn") * 1.0 / RP_BUCKETS)
            .cast("bigint")
            .alias("rk")
        )
    )
    bounds = (
        ranked.join(F.broadcast(bset), F.col("rn") == F.col("rk"))
        .agg(F.array_sort(F.collect_list("cents")).alias("bnds"))
    )
    bucketed = ranked.transform(scalars(bounds)).select(
        "cents",
        "n",
        F.size(F.filter(F.col("bnds"), lambda x: x <= F.col("cents"))).alias(
            "bucket"
        ),
    )
    return (
        bucketed.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            round_eps(F.min("cents") / 100.0, 2).alias("min_price"),
            round_eps(F.max("cents") / 100.0, 2).alias("max_price"),
            round_eps(
                F.count(F.lit(1)) * float(RP_BUCKETS) / F.max("n"), 4
            ).alias("balance_ratio"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- C137

_C137_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
suff AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS ss
  FROM hourly GROUP BY 1
)
SELECT event_type, n,
       {sql_round('s * 1.0 / n', 6)} AS mean_per_hour,
       {sql_round('(n * ss - s * s) * 1.0 / (n * (n - 1)) / (s * 1.0 / n)',
                  6)} AS fano,
       {sql_round(
           '(sqrt((n * ss - s * s) * 1.0 / (n * (n - 1))) - s * 1.0 / n)'
           ' / (sqrt((n * ss - s * s) * 1.0 / (n * (n - 1))) + s * 1.0 / n)',
           6)} AS burstiness
FROM suff WHERE n > 1 ORDER BY event_type
"""


@register("fano_burstiness", oracle=_C137_ORACLE)
def fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean of hourly arrival counts) and the
    Goh-Barabási burstiness index (σ−μ)/(σ+μ) per event type: Fano=1
    is Poisson, >1 over-dispersed/bursty, <1 regular — the dispersion
    number that sizes stream buffers, autoscaling headroom and the
    B39/B74 anomaly thresholds (a Poisson threshold on a bursty
    stream pages you every night). Occupied-hour convention (only
    hours with ≥1 event), matching how the hourly frame is built.

    Scale shape: one (type, hour) aggregate is the volume-bound
    shuffle; the sufficient statistics (exact BIGINT Σc, Σc²)
    collapse per type in a second dimension-scale pass.
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    suff = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    mean = F.col("s") * 1.0 / F.col("n")
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")) * 1.0 / (
        F.col("n") * (F.col("n") - 1)
    )
    return (
        suff.where(F.col("n") > 1)
        .select(
            "event_type",
            "n",
            round_eps(mean, 6).alias("mean_per_hour"),
            round_eps(var / mean, 6).alias("fano"),
            round_eps(
                (F.sqrt(var) - mean) / (F.sqrt(var) + mean), 6
            ).alias("burstiness"),
        )
        .orderBy("event_type")
    )
