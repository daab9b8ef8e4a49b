"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship weekly-stock pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ojo_daps_mirror_spark import plans

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    name = "weekly_stock" if "weekly_stock" in plans.QUERIES else "q1_pricing_summary"
    return plans.QUERIES[name](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (omitted for rows-only ops)."""
    return dict(plans.ORACLES)
