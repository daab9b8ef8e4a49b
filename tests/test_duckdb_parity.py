"""Local pre-flight of the driver's t2 correctness gate.

Runs every registered query against its DuckDB oracle on sf0.001 with
the DRIVER'S comparison recipe (VERDICT r6 #6): row count, name-sorted
columns, both frames stringified via pandas ``astype(str)`` with NO
compare-side rounding, rows sorted. Every rounding a query needs must
live in the query itself (round_eps / sql_round), so a rounding-
boundary drift fails here exactly as it would fail externally.
"""

from __future__ import annotations

import pytest

from ojo_daps_mirror_spark import plans

plans.load_all()

ORACLE_KEYS = sorted(plans.ORACLES)


def _canon(pdf, columns):
    return sorted(map(tuple, pdf[columns].astype(str).values.tolist()))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, sf_dir, key):
    sdf = plans.QUERIES[key](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_pdf = sdf.toPandas()

    ddf = duck.sql(plans.ORACLES[key]).df()
    duck_cols = sorted(ddf.columns)
    assert spark_cols == duck_cols, f"{key}: column mismatch"

    assert len(spark_pdf) == len(ddf), f"{key}: row count mismatch"
    left = _canon(spark_pdf, spark_cols)
    right = _canon(ddf, duck_cols)
    assert left == right, (
        f"{key}: value mismatch\nspark: {left[:5]}\nduck:  {right[:5]}"
    )


def test_all_queries_have_rows(spark, sf_dir):
    for key, fn in plans.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, key
