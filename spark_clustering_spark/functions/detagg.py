"""Deterministic float aggregation + cross-engine-stable rounding.

Two distinct float hazards threaten hash-matching (and cluster
run-to-run reproducibility):

1. SUM/AVG accumulation order. Floating sums are not associative;
   Spark's partial/final aggregation and DuckDB's accumulate in
   different orders. Fix: accumulate in DECIMAL(38,8) — exact, hence
   order-proof.

2. round(double, 4) itself. Spark rounds via the exact decimal
   expansion of the double (BigDecimal HALF_UP); DuckDB multiplies by
   10^4 in float and rounds — they disagree on quasi-decimal values
   like 3774.0412499999998 (a stored 3774.04125). Fix: pivot through
   DECIMAL(38,12) first. The cast recovers the intended ≤12-digit
   decimal value exactly in both engines, and decimal rounding is
   well-defined and identical (HALF_UP == round-half-away-from-zero
   for every sign).

3. DECIMAL→DOUBLE casts of LARGE values (found by the r5 sf0.1
   sweep). DuckDB converts a decimal by double(scaled_integer) /
   10^scale, which stops being correctly rounded once the scaled
   integer exceeds 2^53; the JVM's BigDecimal.doubleValue() is always
   correctly rounded (it falls back to Double.parseDouble of the exact
   decimal string). The r5 mitigation (round to scale 4 first) only
   holds to |value| ~9e11 — sf1 sufficient statistics (Σy² over 6M
   lineitems ≈ 7e16) blow past it. The r6 fix: pivot the DuckDB cast
   through VARCHAR — decimal→VARCHAR is exact digits in both engines,
   and VARCHAR→DOUBLE is correctly rounded in both (fast_float /
   Double.parseDouble) — so the cast agrees with the JVM at ANY
   magnitude. ``sql_dsum``/``sql_dround`` pivot their final cast;
   inline decimal→double casts in hand-written oracles use
   ``sql_d2d``.

Every float column the declared queries emit goes through ``dround``
(or the ``dsum``/``davg`` aggregates); the ``sql_*`` twins generate the
matching DuckDB fragments so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,8)"
_RDEC = "decimal(38,12)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dround(col: Column | str, scale: int = 4) -> Column:
    """Cross-engine-stable round of a double column (no alias)."""
    return F.round(_c(col).cast(_RDEC), scale).cast("double")


def sql_dround(expr: str, scale: int = 4) -> str:
    # the VARCHAR pivot reproduces Spark's double->decimal cast, which
    # goes through the shortest decimal representation (Double.toString);
    # DuckDB's direct cast uses the exact binary expansion and can land
    # on the other side of a .5 boundary. The final decimal->double
    # cast pivots through VARCHAR too (hazard #3: correctly rounded at
    # any magnitude, matching BigDecimal.doubleValue).
    return (
        f"cast(cast(round(cast(cast(({expr}) AS STRING) AS DECIMAL(38,12)), {scale})"
        f" AS STRING) AS DOUBLE)"
    )


def sql_d2d(expr: str) -> str:
    """Correctly-rounded DuckDB decimal→double at any magnitude
    (hazard #3): exact decimal digits via VARCHAR, then fast_float —
    agrees with the JVM's BigDecimal.doubleValue to the last ulp.
    Use in hand-written oracles wherever a decimal sufficient
    statistic is cast to double for closed-form arithmetic."""
    return f"cast(cast(({expr}) AS STRING) AS DOUBLE)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive sum of a double column, rounded to 4 dp."""
    return F.round(F.sum(_c(col).cast(DEC)), 4).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive average: exact decimal sum / count (the double
    division is bit-identical cross-engine), then stable-rounded."""
    return dround(F.sum(_c(col).cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return (
        f"cast(cast(round(sum(cast(({expr}) AS DECIMAL(38,8))), 4)"
        f" AS STRING) AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    inner = f"{sql_d2d(f'sum(cast(({expr}) AS DECIMAL(38,8)))')} / count(*)"
    return f"{sql_dround(inner)} AS {alias}"
