"""Sliding-window "stock" operators.

The reference defines the stock of live job ads on a Monday as all ads
created in the prior ``JOB_AD_LIFESPAN_IN_WEEKS`` (6) weeks
(ojd_daps/dqa/data_getters.py:iterdates/get_snapshot_ads), and publishes
weekly stocks indexed to the average of the first 4 index weeks
(flows/aggregate/weekly_stock.py).

The reference recomputes each window with a fresh DB query per Monday
(and even notes the ~2× overlap waste in aggregate/common.py:
get_weekly_ads). Spark-first, we invert it: each row *emits* the Mondays
it is live on (≤ lifespan+1 values, map-side `sequence`+`explode`) and a
single partial-aggregated groupBy produces every week's stock in one
shuffle of ~|weeks| keys. No per-window scans, no range join, no
driver-side loop — this is the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lineage import cut_lineage

JOB_AD_LIFESPAN_IN_WEEKS = 6
STOCK_WEEKS = 4  # index = average stock of the first 4 weeks

_LIFESPAN_DAYS = JOB_AD_LIFESPAN_IN_WEEKS * 7


def monday_of(col: Column) -> Column:
    """Monday of the week containing ``col`` (date)."""
    return F.date_trunc("week", col).cast("date")


def live_mondays(date_col: Column) -> Column:
    """Array of Mondays on which a row created at ``date_col`` is live.

    A row is live on Monday ``w`` iff ``w - lifespan <= d <= w``, i.e. the
    Mondays in ``[d, d + lifespan]`` — at most lifespan/7 + 1 values.
    """
    d = date_col.cast("date")
    first = F.when(monday_of(d) == d, d).otherwise(F.date_add(monday_of(d), 7))
    last = monday_of(F.date_add(d, _LIFESPAN_DAYS))
    return F.sequence(first, last, F.expr("interval 7 days"))


def weekly_stock(
    df: DataFrame, date_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-Monday live counts, zero-filled over weeks × groups, indexed.

    Returns columns: ``week`` (ISO string), *group_cols, ``stock``,
    ``indexed_volume`` (100 = average of the group's first 4 weeks,
    rounded to 4 dp; NULL when the index window is empty).
    """
    group_cols = group_cols or []

    # Map-side explode: each row contributes to ≤7 Mondays; the only wide
    # shuffle is the groupBy, pre-combined map-side to ~|weeks|×|groups| keys.
    # The week-dimension bounds (monday(min d), monday(max d)) ride the
    # SAME shuffle as two extra per-key min/max partials instead of a
    # second full aggregate over the facts: every row is live on ≥1
    # Monday, so min/max of d over the live stream equal min/max over df.
    live = df.select(
        *group_cols,
        F.col(date_col).cast("date").alias("__d__"),
        F.explode(live_mondays(F.col(date_col))).alias("week"),
    )
    stock_full = live.groupBy("week", *group_cols).agg(
        F.count(F.lit(1)).alias("stock"),
        F.min("__d__").alias("__dmin__"),
        F.max("__d__").alias("__dmax__"),
    )
    # ~|weeks|×|groups| rows. Materialize once: the frame feeds the
    # bounds agg plus fill_and_index's four references — without the cut,
    # each reference replays the full fact scan + shuffle (A2's plan held
    # 48 scans of the orders⋈geo subtree; with it, one).
    stock_full = cut_lineage(stock_full)
    bounds = stock_full.agg(
        monday_of(F.min("__dmin__")).alias("wmin"),
        monday_of(F.max("__dmax__")).alias("wmax"),
    )
    weeks = bounds.select(
        F.explode(F.sequence("wmin", "wmax", F.expr("interval 7 days"))).alias("week")
    )
    stock = stock_full.select("week", *group_cols, "stock")
    return fill_and_index(stock, weeks, group_cols)


def fill_and_index(
    stock: DataFrame, weeks: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Zero-fill + index a pre-aggregated (week, *group_cols, stock)
    frame over the given week dimension — the finishing stage of
    ``weekly_stock``, shared with the incremental-refresh path (which
    merges a maintained count state with a delta before finishing).
    ``stock`` is ~|weeks|×|groups| rows, so everything here is
    dimension-scale.
    """
    group_cols = group_cols or []

    # Zero-fill missing (week, group) cells so indexes are well-defined.
    # The group dimension comes from the POST-AGGREGATION stock frame,
    # not a second scan of the fact table: every source row is live on
    # at least one Monday (monday(d+lifespan) ≥ the Monday after d), so
    # every group present in the data appears in `stock` — and `stock`
    # is ~|weeks|×|groups| rows, so the distinct is driver-scale where
    # a distinct over the facts would be a second full scan + wide
    # shuffle at 100 TB.
    if group_cols:
        cells = weeks.crossJoin(stock.select(*group_cols).distinct())
    else:
        cells = weeks
    filled = (
        cells.join(stock, on=["week", *group_cols], how="left")
        .withColumn("stock", F.coalesce(F.col("stock"), F.lit(0)))
    )

    # Index value per group: average stock of the first STOCK_WEEKS weeks
    # (reference pins April 2021; here the data's first 4 weeks).
    w = Window.partitionBy(*group_cols).orderBy("week") if group_cols else (
        Window.orderBy("week")
    )
    ranked = filled.withColumn("week_rank", F.row_number().over(w))
    index = (
        ranked.where(F.col("week_rank") <= STOCK_WEEKS)
        .groupBy(*group_cols)
        .agg(F.avg("stock").alias("index_value"))
    )
    joined = (
        filled.join(F.broadcast(index), on=group_cols)
        if group_cols
        else filled.crossJoin(F.broadcast(index))
    )
    return joined.select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        *group_cols,
        "stock",
        # Zero-index groups (no stock in the index window) are pinned to
        # 0.0 rather than NULL — NULL floats round-trip as NaN via pandas
        # and break cross-engine comparison.
        F.coalesce(
            F.round(
                100.0 * F.col("stock") / F.nullif(F.col("index_value"), F.lit(0)),
                4,
            ),
            F.lit(0.0),
        ).alias("indexed_volume"),
    )


def oracle_weekly_stock_sql(
    source_sql: str, date_expr: str, group_cols: list[str] | None = None
) -> str:
    """DuckDB SQL computing the identical weekly stock.

    ``source_sql`` must select ``d`` (a DATE) plus any group columns.
    """
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    g_comma = f"{g}, " if g else ""
    cells_sql = (
        f"SELECT week, {g} FROM weeks CROSS JOIN (SELECT DISTINCT {g} FROM src) grp"
        if group_cols
        else "SELECT week FROM weeks"
    )
    part = f"PARTITION BY {g} " if group_cols else ""
    join_idx = (
        "JOIN idx USING (" + g + ")" if group_cols else "CROSS JOIN idx"
    )
    return f"""
WITH src AS ({source_sql}),
bounds AS (
  SELECT date_trunc('week', MIN(d))::DATE AS wmin,
         date_trunc('week', MAX(d))::DATE AS wmax
  FROM src
),
weeks AS (
  SELECT unnest(generate_series(wmin, wmax, INTERVAL 7 DAY))::DATE AS week
  FROM bounds
),
live AS (
  SELECT {g_comma}unnest(generate_series(
           CASE WHEN date_trunc('week', d)::DATE = d THEN d
                ELSE date_trunc('week', d)::DATE + 7 END,
           date_trunc('week', d + {_LIFESPAN_DAYS})::DATE,
           INTERVAL 7 DAY))::DATE AS week
  FROM src
),
stock AS (
  SELECT week, {g_comma}COUNT(*) AS stock FROM live GROUP BY ALL
),
cells AS ({cells_sql}),
filled AS (
  SELECT cells.*, COALESCE(stock.stock, 0) AS stock
  FROM cells LEFT JOIN stock USING (week{"," + g if g else ""})
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER ({part}ORDER BY week) AS week_rank FROM filled
),
idx AS (
  SELECT {g_comma}AVG(stock) AS index_value
  FROM ranked WHERE week_rank <= {STOCK_WEEKS} GROUP BY ALL
)
SELECT strftime(filled.week, '%Y-%m-%d') AS week, {g_comma}filled.stock,
       COALESCE(ROUND(100.0 * filled.stock / NULLIF(idx.index_value, 0), 4), 0.0)
         AS indexed_volume
FROM filled {join_idx}
"""
