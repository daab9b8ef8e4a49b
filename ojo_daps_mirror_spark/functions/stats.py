"""Cross-engine statistical primitives.

Neither Spark SQL nor DuckDB exposes the normal CDF as a built-in
shared by both, so the Abramowitz & Stegun 7.1.26 erf polynomial
(|error| < 1.5e-7) is generated here ONCE as both a Column expression
and a SQL string from the same constants — the two engines evaluate
the identical arithmetic, so 6-dp rounded p-values can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 erf approximation constants.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_pos(x: Column) -> Column:
    """erf(x) for x >= 0 via A&S 7.1.26."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = (
        _AS_A[0] * t
        + _AS_A[1] * t * t
        + _AS_A[2] * t * t * t
        + _AS_A[3] * t * t * t * t
        + _AS_A[4] * t * t * t * t * t
    )
    return 1.0 - poly * F.exp(-x * x)


def sql_erf_pos(x: str) -> str:
    t = f"(1.0 / (1.0 + {_AS_P!r} * ({x})))"
    poly = (
        f"({_AS_A[0]!r} * {t} + {_AS_A[1]!r} * {t} * {t}"
        f" + {_AS_A[2]!r} * {t} * {t} * {t}"
        f" + {_AS_A[3]!r} * {t} * {t} * {t} * {t}"
        f" + {_AS_A[4]!r} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"(1.0 - {poly} * exp(-({x}) * ({x})))"


_SQRT2 = 1.4142135623730951


def normal_sf_abs(z: Column) -> Column:
    """P(Z > |z|) for a standard normal — upper tail at the absolute value."""
    return 0.5 * (1.0 - erf_pos(F.abs(z) / _SQRT2))


def sql_normal_sf_abs(z: str) -> str:
    return f"(0.5 * (1.0 - {sql_erf_pos(f'ABS({z}) / {_SQRT2!r}')}))"


def normal_cdf(z: Column) -> Column:
    """Phi(z) for any sign via the odd symmetry erf(-x) = -erf(x)."""
    signed = F.when(z < 0, -1.0).otherwise(1.0) * erf_pos(F.abs(z) / _SQRT2)
    return 0.5 * (1.0 + signed)


def sql_normal_cdf(z: str) -> str:
    signed = (
        f"((CASE WHEN ({z}) < 0 THEN -1.0 ELSE 1.0 END)"
        f" * {sql_erf_pos(f'ABS({z}) / {_SQRT2!r}')})"
    )
    return f"(0.5 * (1.0 + {signed}))"
