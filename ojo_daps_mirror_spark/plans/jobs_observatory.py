"""Jobs-observatory analog queries (SURVEY.md §2.A).

Each plan reproduces one reference computation on the driver-provided
testdata (orders = job ads, customer→nation→region = geography,
events = salary-bearing stream, part = SOC-lookup source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps
from ..functions.salaries import ORACLE_SALARY_CTE, annualise
from ..operators.snapshot import oracle_weekly_stock_sql, weekly_stock
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- A1/A2

_A1_ORACLE = oracle_weekly_stock_sql(
    "SELECT o_orderdate::DATE AS d FROM orders", "o_orderdate"
)


@register("weekly_stock", oracle=_A1_ORACLE)
def weekly_stock_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stock of live orders, indexed to the first-4-week average.

    Reference: ojd_daps/flows/aggregate/weekly_stock.py +
    dqa/data_getters.py:iterdates (6-week ad lifespan).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("d")
    )
    return weekly_stock(orders, "d")


_A2_ORACLE = oracle_weekly_stock_sql(
    """SELECT o_orderdate::DATE AS d, r_name
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey""",
    "o_orderdate",
    ["r_name"],
)


@register("weekly_stock_by_region", oracle=_A2_ORACLE)
def weekly_stock_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stock by region, each region indexed to its own first-4-week
    average. Reference: weekly_stock.py:prepare_stock_lookup/aggregate
    (weekly_loc_vacancies)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    geo = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    src = (
        orders.join(F.broadcast(geo), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("o_orderdate").alias("d"), "r_name")
    )
    return weekly_stock(src, "d", ["r_name"])


# ---------------------------------------------------------------- A3/A4

_A3_ORACLE = f"""
WITH {ORACLE_SALARY_CTE.strip().lstrip()}
SELECT event_id, rate, min_salary, max_salary,
       min_annualised_salary, max_annualised_salary
FROM salaries
ORDER BY event_id
"""


@register("salary_extraction", oracle=_A3_ORACLE)
def salary_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extract_salary rule chain (labs/salaries/common.py) as
    whole-stage-codegen CASE expressions over events."""
    events = load_table(spark, sf_dir, "events")
    return annualise(events).select(
        "event_id",
        "rate",
        "min_salary",
        "max_salary",
        "min_annualised_salary",
        "max_annualised_salary",
    ).orderBy("event_id")


_A4_ORACLE = f"""
WITH {ORACLE_SALARY_CTE.strip().lstrip()}
SELECT strftime(date_trunc('week', ts)::DATE, '%Y-%m-%d') AS week,
       ROUND(quantile_cont(min_annualised_salary, 0.25) / 1000 + 1e-9, 4) AS min_lower_q,
       ROUND(quantile_cont(min_annualised_salary, 0.50) / 1000 + 1e-9, 4) AS min_median,
       ROUND(quantile_cont(min_annualised_salary, 0.75) / 1000 + 1e-9, 4) AS min_upper_q,
       ROUND(quantile_cont(max_annualised_salary, 0.25) / 1000 + 1e-9, 4) AS max_lower_q,
       ROUND(quantile_cont(max_annualised_salary, 0.50) / 1000 + 1e-9, 4) AS max_median,
       ROUND(quantile_cont(max_annualised_salary, 0.75) / 1000 + 1e-9, 4) AS max_upper_q,
       COUNT(*) AS n_salaries
FROM salaries
GROUP BY date_trunc('week', ts)::DATE
ORDER BY week
"""


@register("weekly_salary_spread", oracle=_A4_ORACLE)
def weekly_salary_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-week quartiles of annualised salaries in £000
    (aggregate/common.py:iterquantiles, weekly_salary_spread.py).

    Exact `percentile` matches DuckDB's quantile_cont for oracle parity;
    at 100 TB swap to approx_percentile (sketch-mergeable, one pass) —
    executable via SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py,
    tolerance-tested in tests/test_scale_mode.py).
    """
    events = load_table(spark, sf_dir, "events")
    sal = annualise(events).withColumn(
        "week", F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    )

    # One percentile buffer per column (array of quantiles), not one per
    # (column, quantile) — 2 sort-based aggregates instead of 6.
    qs = F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    agg = sal.groupBy("week").agg(
        sm.percentile(F.col("min_annualised_salary"), qs).alias("min_q"),
        sm.percentile(F.col("max_annualised_salary"), qs).alias("max_q"),
        F.count(F.lit(1)).alias("n_salaries"),
    )

    def q(arr: str, idx: int, alias: str):
        return round_eps(F.col(arr)[idx] / 1000.0, 4).alias(alias)

    return agg.select(
        "week",
        q("min_q", 0, "min_lower_q"),
        q("min_q", 1, "min_median"),
        q("min_q", 2, "min_upper_q"),
        q("max_q", 0, "max_lower_q"),
        q("max_q", 1, "max_median"),
        q("max_q", 2, "max_upper_q"),
        "n_salaries",
    ).orderBy("week")


# ---------------------------------------------------------------- A5

_A5_ORACLE = """
WITH located AS (
  SELECT CASE WHEN c_acctbal < 0 THEN 'ZZZ1'
              WHEN r_name = 'EUROPE' THEN 'EU0'
              ELSE 'R' || r_regionkey END AS location_code,
         CASE WHEN c_acctbal < 0 THEN 'Unmatched'
              WHEN r_name = 'EUROPE' THEN 'EUROPE-MERGED'
              ELSE r_name END AS location_name
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
)
SELECT location_code, location_name, COUNT(*) AS n_ads
FROM located
GROUP BY location_code, location_name
ORDER BY location_code
"""


@register("jobs_by_location", oracle=_A5_ORACLE)
def jobs_by_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume by standardised location: merged super-region + default code
    for unmatched rows (aggregate/common.py:standardise_location — London
    merge → EUROPE merge; None → ZZZ1/Unmatched)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    located = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.when(F.col("c_acctbal") < 0, "ZZZ1")
            .when(F.col("r_name") == "EUROPE", "EU0")
            .otherwise(F.concat(F.lit("R"), F.col("r_regionkey")))
            .alias("location_code"),
            F.when(F.col("c_acctbal") < 0, "Unmatched")
            .when(F.col("r_name") == "EUROPE", "EUROPE-MERGED")
            .otherwise(F.col("r_name"))
            .alias("location_name"),
        )
    )
    return (
        located.groupBy("location_code", "location_name")
        .agg(F.count(F.lit(1)).alias("n_ads"))
        .orderBy("location_code")
    )


# ---------------------------------------------------------------- A6/A7/A8

_A6_ORACLE = """
SELECT source,
       lang AS skill_group,
       ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY source) + 1e-9, 4)
         AS percentage,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source, lang
ORDER BY source, skill_group
"""


@register("skills_demand_snapshot", oracle=_A6_ORACLE)
def skills_demand_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage mix of each cluster within a group
    (aggregate/common.py:aggregate_skills / skill_demand_snapshot.py):
    lang = skill cluster, source = grouping code."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", F.col("lang").alias("skill_group")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "skill_group",
        round_eps(100.0 * F.col("n_docs") / F.sum("n_docs").over(w), 4).alias(
            "percentage"
        ),
        "n_docs",
    ).orderBy("source", "skill_group")


_A7_ORACLE = """
SELECT n_name,
       o_orderpriority AS skill_group,
       ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY n_name) + 1e-9, 4)
         AS percentage
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderpriority
ORDER BY n_name, skill_group
"""


@register("skills_by_location_snapshot", oracle=_A7_ORACLE)
def skills_by_location_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skill-mix share per location (skill_cats_by_loc_snaphot.py):
    order priority = skill group, nation = location."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    counts = joined.groupBy("n_name", F.col("o_orderpriority").alias("skill_group")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("n_name")
    return counts.select(
        "n_name",
        "skill_group",
        round_eps(100.0 * F.col("n") / F.sum("n").over(w), 4).alias("percentage"),
    ).orderBy("n_name", "skill_group")


_A8_ORACLE = """
SELECT o_orderpriority AS skill_group,
       ROUND(quantile_cont(o_totalprice, 0.25) / 1000 + 1e-9, 4) AS lower_q,
       ROUND(quantile_cont(o_totalprice, 0.50) / 1000 + 1e-9, 4) AS median,
       ROUND(quantile_cont(o_totalprice, 0.75) / 1000 + 1e-9, 4) AS upper_q,
       COUNT(*) AS n_ads
FROM orders
GROUP BY o_orderpriority
ORDER BY skill_group
"""


@register("skill_salary_spread", oracle=_A8_ORACLE)
def skill_salary_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salary-spread quartiles per skill group
    (skill_salary_spread_snapshot.py), in £000. Same percentile family
    as A4: exact for oracle parity, approx_percentile under
    SPARK_GRAFT_SCALE_MODE=approx."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("skill_group"))
        .agg(
            round_eps(sm.percentile("o_totalprice", 0.25) / 1000, 4).alias(
                "lower_q"
            ),
            round_eps(sm.percentile("o_totalprice", 0.50) / 1000, 4).alias(
                "median"
            ),
            round_eps(sm.percentile("o_totalprice", 0.75) / 1000, 4).alias(
                "upper_q"
            ),
            F.count(F.lit(1)).alias("n_ads"),
        )
        .orderBy("skill_group")
    )


# ---------------------------------------------------------------- A9

_A9_ORACLE = """
SELECT ('0x' || substr(md5(p_brand || '|' || p_type), 1, 15))::BIGINT AS soc_id,
       p_brand AS soc_code,
       p_type  AS soc_title
FROM (SELECT DISTINCT p_brand, p_type FROM part)
ORDER BY soc_id
"""


@register("soc_hash_lookup", oracle=_A9_ORACLE)
def soc_hash_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key lookup dimension with a deterministic md5-based
    60-bit short hash (flows/pre_enrich/soc_lookup.py:short_hash).
    Uniqueness is enforced the same way the reference validates its
    soc_ids (tested in tests/test_jobs_observatory.py)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_brand", "p_type")
        .distinct()
        .select(
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "p_brand", "p_type")), 1, 15),
                16,
                10,
            )
            .cast("bigint")
            .alias("soc_id"),
            F.col("p_brand").alias("soc_code"),
            F.col("p_type").alias("soc_title"),
        )
        .orderBy("soc_id")
    )


@register("weekly_salary_spread_approx")  # rows-only: sketch-based by design
def weekly_salary_spread_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for A4: same weekly quartiles via
    approx_percentile (KLL-style sketch — single pass, mergeable
    partials, no per-group sort buffer). At cluster scale the exact
    percentile's sort-based aggregation buffers every group's values;
    the sketch keeps map-side state O(log n) per group and merges.
    Tolerance vs the exact A4 quartiles is asserted in
    tests/test_properties.py.
    """
    events = load_table(spark, sf_dir, "events")
    sal = annualise(events).withColumn(
        "week", F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    )
    qs = F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    acc = F.lit(10_000)
    agg = sal.groupBy("week").agg(
        F.approx_percentile(F.col("min_annualised_salary"), qs, acc).alias("min_q"),
        F.approx_percentile(F.col("max_annualised_salary"), qs, acc).alias("max_q"),
        F.count(F.lit(1)).alias("n_salaries"),
    )

    def q(arr: str, idx: int, alias: str):
        return round_eps(F.col(arr)[idx] / 1000.0, 4).alias(alias)

    return agg.select(
        "week",
        q("min_q", 0, "min_lower_q"),
        q("min_q", 1, "min_median"),
        q("min_q", 2, "min_upper_q"),
        q("max_q", 0, "max_lower_q"),
        q("max_q", 1, "max_median"),
        q("max_q", 2, "max_upper_q"),
        "n_salaries",
    ).orderBy("week")
