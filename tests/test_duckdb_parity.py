"""Local pre-flight of the driver's t2 correctness gate.

Runs every registered query against its DuckDB oracle on sf0.001 and
compares row count, column names, and order-insensitive values — the same
comparison shape the driver applies at sf0.01.
"""

from __future__ import annotations

import math

import pytest

from ojo_daps_mirror_spark import plans

plans.load_all()

ORACLE_KEYS = sorted(plans.ORACLES)


def _normalise(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, sf_dir, key):
    sdf = plans.QUERIES[key](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [r.asDict() for r in sdf.collect()]

    ddf = duck.sql(plans.ORACLES[key]).df()
    duck_cols = sorted(ddf.columns)
    assert spark_cols == duck_cols, f"{key}: column mismatch"
    duck_rows = ddf.to_dict("records")

    assert len(spark_rows) == len(duck_rows), f"{key}: row count mismatch"
    left = _normalise(spark_rows, spark_cols)
    right = _normalise(duck_rows, duck_cols)
    assert left == right, (
        f"{key}: value mismatch\nspark: {left[:5]}\nduck:  {right[:5]}"
    )


def test_all_queries_have_rows(spark, sf_dir):
    for key, fn in plans.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, key
