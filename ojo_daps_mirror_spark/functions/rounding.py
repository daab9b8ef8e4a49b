"""Cross-engine deterministic rounding.

Quantised inputs (2-dp prices, rate multipliers, quantile interpolation at
.25/.5/.75) produce values that sit exactly on round-half boundaries
(e.g. 30566.25 / 1950 = 15.675). IEEE doubles represent such values a few
ulp above or below the boundary, and Spark and DuckDB can land on
*opposite* sides after differently-ordered arithmetic — flipping the last
rounded digit and failing a value-hash comparison.

``round_eps`` nudges the value up by 1e-9 before rounding in BOTH engines:
values on the decimal boundary round half-up correctly, and 1-ulp
cross-engine discrepancies near the boundary collapse to the same side.
Only valid for non-negative quantities rounded to ≤6 dp (true here for
every money/percentage column in the engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def round_eps(col: Column, scale: int) -> Column:
    return F.round(col + EPS, scale)


def sql_round(expr: str, scale: int) -> str:
    return f"ROUND(({expr}) + {EPS!r}, {scale})"
