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
    rate = rate_col()
    rate_mult = (
        F.when(rate == "DAY", PER_ANNUM_RATE["DAY"])
        .when(rate == "HOUR", PER_ANNUM_RATE["HOUR"])
        .otherwise(PER_ANNUM_RATE["YEAR"])
    )
    scale = (
        F.when(rate == "DAY", SCALE_FOR_RATE["DAY"])
        .when(rate == "HOUR", SCALE_FOR_RATE["HOUR"])
        .otherwise(SCALE_FOR_RATE["YEAR"])
    )
    # The whole chain is built as shared Column expressions feeding ONE
    # filter + ONE projection — not a withColumn/where ladder. Catalyst
    # collapses a ladder into the same two operators anyway, but every
    # filter it pushes down re-inlines the expression trees it
    # references, leaving the per-row regexp strewn across four
    # Filter/Project operators (measured at sf0.1: 1.6 s → 1.2 s for
    # annualise alone, 2.4 s → 1.5 s for weekly_salary_spread). With
    # one Filter and one Project, codegen's common-subexpression
    # elimination runs the expensive leaves once per operator.
    currency = F.when(F.col("user_id") % 20 == 0, "USD").otherwise("GBP")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int")
    raw_a = F.col("value") * scale
    raw_b = raw_a * (1 + k / 10.0)
    min_annual0 = F.least(raw_a, raw_b) * rate_mult
    max_annual0 = F.greatest(raw_a, raw_b) * rate_mult
    min_annual1 = F.when(min_annual0 < MIN_SALARY, max_annual0).otherwise(min_annual0)
    over_disparity = max_annual0 / min_annual1 > MIN_SALARY_DISPARITY
    min_annual = F.when(
        over_disparity & (max_annual0 <= MAX_SALARY), max_annual0
    ).otherwise(min_annual1)
    max_annual = F.when(
        over_disparity & (max_annual0 > MAX_SALARY), min_annual1
    ).otherwise(max_annual0)
    keep = (
        rate.isNotNull()
        & (currency == "GBP")
        & (max_annual0 >= MIN_SALARY)
        & (max_annual <= MAX_SALARY)
    )
    return df.where(keep).select(
        F.col("event_id"),
        F.col("ts"),
        rate.alias("rate"),
        round_eps(min_annual / rate_mult, 2).alias("min_salary"),
        round_eps(max_annual / rate_mult, 2).alias("max_salary"),
        round_eps(min_annual, 2).alias("min_annualised_salary"),
        round_eps(max_annual, 2).alias("max_annualised_salary"),
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
