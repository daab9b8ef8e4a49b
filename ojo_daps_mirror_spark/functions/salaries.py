"""Standardised-salary extraction as pure Column expressions.

Re-expresses the reference's row-wise rule chain
(ojd_daps/flows/enrich/labs/salaries/common.py:extract_salary) as
JVM-side CASE expressions so Catalyst keeps the whole pipeline inside
whole-stage codegen — no Python in the hot path.

The rule chain, in order (constants identical to the reference):
  1. no rate (salary unit) → excluded
  2. non-GBP currency → excluded
  3. (min,max) sorted, annualised by the per-rate multiplier
  4. max_annual below minimum wage → excluded
  5. min_annual below minimum wage → symmetrised up to max_annual
  6. max/min disparity > 10× → collapse the implausible bound
  7. max_annual above the 500k cut → excluded

``ORACLE_SALARY_CTE`` is the same chain as DuckDB SQL, generated from
the same constants so the two can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from .rounding import round_eps
from pyspark.sql import functions as F

WEEKS_IN_YEAR = 52
WORKDAYS_PER_WEEK = 5
HOURS_PER_WEEK = 37.5
PER_ANNUM_RATE = {
    "DAY": float(WORKDAYS_PER_WEEK * WEEKS_IN_YEAR),  # 260
    "HOUR": HOURS_PER_WEEK * WEEKS_IN_YEAR,  # 1950
    "YEAR": 1.0,
}
MIN_SALARY = 4.20 * PER_ANNUM_RATE["HOUR"]  # 8190 GBP, apprentice min wage
MIN_SALARY_DISPARITY = 10.0
MAX_SALARY = 500_000.0

# Deterministic mapping of the events table onto raw-salary inputs
# (events stand in for RawJobAd: event_type → raw_salary_unit,
# value → raw salary, props.k → the min/max spread).
RATE_FOR_EVENT = {"click": "HOUR", "view": "DAY", "purchase": "YEAR", "signup": "YEAR"}
SCALE_FOR_RATE = {"HOUR": 1.0, "DAY": 3.0, "YEAR": 300.0}


def rate_col() -> Column:
    expr = F.lit(None).cast("string")
    for etype, rate in RATE_FOR_EVENT.items():
        expr = F.when(F.col("event_type") == etype, rate).otherwise(expr)
    return expr


def annualise(df: DataFrame) -> DataFrame:
    """events → standardised salaries (one row per salary-bearing event)."""
    rate_mult = (
        F.when(F.col("rate") == "DAY", PER_ANNUM_RATE["DAY"])
        .when(F.col("rate") == "HOUR", PER_ANNUM_RATE["HOUR"])
        .otherwise(PER_ANNUM_RATE["YEAR"])
    )
    scale = (
        F.when(F.col("rate") == "DAY", SCALE_FOR_RATE["DAY"])
        .when(F.col("rate") == "HOUR", SCALE_FOR_RATE["HOUR"])
        .otherwise(SCALE_FOR_RATE["YEAR"])
    )
    stage = (
        df.withColumn("rate", rate_col())
        .withColumn(
            "currency",
            F.when(F.col("user_id") % 20 == 0, "USD").otherwise("GBP"),
        )
        .withColumn(
            "k", F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int")
        )
        .where(F.col("rate").isNotNull() & (F.col("currency") == "GBP"))
        .withColumn("raw_a", F.col("value") * scale)
        .withColumn("raw_b", F.col("raw_a") * (1 + F.col("k") / 10.0))
        .withColumn("min_raw", F.least("raw_a", "raw_b"))
        .withColumn("max_raw", F.greatest("raw_a", "raw_b"))
        .withColumn("rate_mult", rate_mult)
        .withColumn("min_annual0", F.col("min_raw") * rate_mult)
        .withColumn("max_annual0", F.col("max_raw") * rate_mult)
        .where(F.col("max_annual0") >= MIN_SALARY)
        .withColumn(
            "min_annual1",
            F.when(F.col("min_annual0") < MIN_SALARY, F.col("max_annual0")).otherwise(
                F.col("min_annual0")
            ),
        )
        .withColumn(
            "over_disparity",
            F.col("max_annual0") / F.col("min_annual1") > MIN_SALARY_DISPARITY,
        )
        .withColumn(
            "min_annual",
            F.when(
                F.col("over_disparity") & (F.col("max_annual0") <= MAX_SALARY),
                F.col("max_annual0"),
            ).otherwise(F.col("min_annual1")),
        )
        .withColumn(
            "max_annual",
            F.when(
                F.col("over_disparity") & (F.col("max_annual0") > MAX_SALARY),
                F.col("min_annual1"),
            ).otherwise(F.col("max_annual0")),
        )
        .where(F.col("max_annual") <= MAX_SALARY)
    )
    return stage.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("rate"),
        round_eps(F.col("min_annual") / F.col("rate_mult"), 2).alias("min_salary"),
        round_eps(F.col("max_annual") / F.col("rate_mult"), 2).alias("max_salary"),
        round_eps(F.col("min_annual"), 2).alias("min_annualised_salary"),
        round_eps(F.col("max_annual"), 2).alias("max_annualised_salary"),
    )


def _sql_rate_case() -> str:
    whens = "\n    ".join(
        f"WHEN event_type = '{e}' THEN '{r}'" for e, r in RATE_FOR_EVENT.items()
    )
    return f"CASE {whens} ELSE NULL END"


def _sql_mult_case(mapping: dict[str, float]) -> str:
    whens = " ".join(f"WHEN rate = '{k}' THEN {v!r}" for k, v in mapping.items())
    return f"CASE {whens} END"


# DuckDB CTE chain computing the identical result over `events`.
ORACLE_SALARY_CTE = f"""
salary_stage0 AS (
  SELECT event_id, ts,
         {_sql_rate_case()} AS rate,
         CASE WHEN user_id % 20 = 0 THEN 'USD' ELSE 'GBP' END AS currency,
         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k,
         value
  FROM events
),
salary_stage1 AS (
  SELECT *,
         value * {_sql_mult_case(SCALE_FOR_RATE)} AS raw_a,
         value * {_sql_mult_case(SCALE_FOR_RATE)} * (1 + k / 10.0) AS raw_b,
         {_sql_mult_case(PER_ANNUM_RATE)} AS rate_mult
  FROM salary_stage0
  WHERE rate IS NOT NULL AND currency = 'GBP'
),
salary_stage2 AS (
  SELECT *,
         LEAST(raw_a, raw_b) * rate_mult    AS min_annual0,
         GREATEST(raw_a, raw_b) * rate_mult AS max_annual0
  FROM salary_stage1
),
salary_stage3 AS (
  SELECT *,
         CASE WHEN min_annual0 < {MIN_SALARY!r} THEN max_annual0
              ELSE min_annual0 END AS min_annual1
  FROM salary_stage2
  WHERE max_annual0 >= {MIN_SALARY!r}
),
salary_stage4 AS (
  SELECT *,
         (max_annual0 / min_annual1 > {MIN_SALARY_DISPARITY!r}) AS over_disparity,
         CASE WHEN (max_annual0 / min_annual1 > {MIN_SALARY_DISPARITY!r})
                   AND max_annual0 <= {MAX_SALARY!r}
              THEN max_annual0 ELSE min_annual1 END AS min_annual,
         CASE WHEN (max_annual0 / min_annual1 > {MIN_SALARY_DISPARITY!r})
                   AND max_annual0 > {MAX_SALARY!r}
              THEN min_annual1 ELSE max_annual0 END AS max_annual
  FROM salary_stage3
),
salaries AS (
  SELECT event_id, ts, rate,
         ROUND(min_annual / rate_mult + 1e-9, 2) AS min_salary,
         ROUND(max_annual / rate_mult + 1e-9, 2) AS max_salary,
         ROUND(min_annual + 1e-9, 2) AS min_annualised_salary,
         ROUND(max_annual + 1e-9, 2) AS max_annualised_salary
  FROM salary_stage4
  WHERE max_annual <= {MAX_SALARY!r}
)
"""
