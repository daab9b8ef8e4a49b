"""Extract-stage parity plans (SURVEY.md §2 A21–A22).

- extract_fields — the collect/extract stage: gate on a marker, parse
  typed fields out of a semi-structured raw payload by regex AND by
  JSON path, strip markup (flows/extract/reed.py:get_reed_details/
  reed_detail_parser/strip_html).
- weekly_soc_vacancies — weekly indexed stock per level-1 SOC group
  (flows/aggregate/weekly_soc_vacancies.py: truncate SOC to level 1,
  weekly stock indexed to the first-4-week average).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.snapshot import oracle_weekly_stock_sql, weekly_stock
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- A21

_A21_ORACLE = r"""
SELECT event_id,
       regexp_extract(props, '"k": (\d+)', 1) AS k_regex,
       json_extract(props, '$.k')::VARCHAR    AS k_json,
       regexp_replace(event_type, '<[^>]*>', '', 'g') AS clean_type,
       'events' AS data_source
FROM events
WHERE props LIKE '%"k"%'
ORDER BY event_id
"""


@register("extract_fields", oracle=_A21_ORACLE)
def extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-payload field extraction — the collect/extract stage.

    Reference: flows/extract/reed.py — get_reed_details gates each raw
    ad on a marker substring ('baseSalary'), pulls each field with
    ``re.search(f"{field}: (.*),")`` (reed_detail_parser), strips HTML
    (strip_html), and stamps a constant data_source. Both of the
    reference's parsing modes are reproduced as codegen'd expressions:
    regexp_extract for the dataLayer-style regex, get_json_object for
    the structured path — driver-side BeautifulSoup becomes zero Python.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("props").like('%"k"%'))
        .select(
            "event_id",
            F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).alias("k_regex"),
            F.get_json_object(F.col("props"), "$.k").alias("k_json"),
            F.regexp_replace(F.col("event_type"), r"<[^>]*>", "").alias(
                "clean_type"
            ),
            F.lit("events").alias("data_source"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- A22

_A22_ORACLE = oracle_weekly_stock_sql(
    """SELECT o_orderdate::DATE AS d,
              substr(o_orderpriority, 1, 1) AS soc_group
       FROM orders""",
    "o_orderdate",
    ["soc_group"],
)


@register("weekly_soc_vacancies", oracle=_A22_ORACLE)
def weekly_soc_vacancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly indexed stock per level-1 SOC group.

    Reference: flows/aggregate/weekly_soc_vacancies.py — each ad's SOC
    codes are truncated to level 1 ("soc_code[0]") and the weekly stock
    per group is indexed to that group's first-4-week average. Priority
    code's first character stands in for the SOC level-1 truncation;
    the stock operator is the same map-side-explode one A1/A2 use.
    """
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_orderdate").alias("d"),
        F.substring("o_orderpriority", 1, 1).alias("soc_group"),
    )
    return weekly_stock(src, "d", ["soc_group"])

# ---------------------------------------------------------------- A30

_A30_ORACLE = r"""
SELECT event_id,
       replace(NULLIF(regexp_extract(props, '"k":(.*?)}', 1), ''), '"', '')
         AS job_key,
       NULLIF(regexp_extract(props, '"salaryText":(.*?),', 1), '')
         AS job_salary_raw,
       regexp_replace(event_type, '<[^>]*>', '', 'g') AS description,
       'Indeed' AS data_source
FROM events
ORDER BY event_id
"""


@register("extract_indeed", oracle=_A30_ORACLE)
def extract_indeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indeed-board extractor variant — null-on-miss, quote-strip.

    Reference: flows/extract/indeed.py:get_indeed_details/regex_search —
    unlike reed's marker-gated parser (A21), indeed processes every raw
    ad, each field is a non-greedy ``re.search`` returning None on miss
    with quotes stripped from hits, and unstructured fields (salary
    here) stay NULL when the board doesn't publish them. NULLIF models
    regex_search's except→None; tag-strip models indeed_detail_parser's
    .text. Map-only codegen pass, same as A21.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.replace(
            F.nullif(F.regexp_extract(F.col("props"), r'"k":(.*?)}', 1), F.lit("")),
            F.lit('"'),
            F.lit(""),
        ).alias("job_key"),
        F.nullif(
            F.regexp_extract(F.col("props"), r'"salaryText":(.*?),', 1), F.lit("")
        ).alias("job_salary_raw"),
        F.regexp_replace(F.col("event_type"), r"<[^>]*>", "").alias("description"),
        F.lit("Indeed").alias("data_source"),
    ).orderBy("event_id")
