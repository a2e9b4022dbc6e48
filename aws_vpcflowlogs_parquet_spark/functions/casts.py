"""Expression helpers: reference cast semantics + oracle-exact aggregation.

``zero_default_cast`` reproduces the reference parser's key semantic quirk
(flowlog.go:59-90): every numeric field is parsed with ``strconv.Atoi`` and
assigned *only on success*, so a non-numeric token (the ``-`` that VPC Flow
Logs emits for NODATA/SKIPDATA rows) silently becomes Go's zero value 0.
Spark's plain ``cast`` yields null there; ``coalesce(try_cast, 0)`` restores
the reference behavior (SURVEY §1.2).

``exact_sum`` / ``exact_avg`` make double aggregation deterministic across
engines: IEEE-754 summation is order-dependent, and Spark's partial/final
aggregation order differs from DuckDB's, so ``SUM(double)`` would differ in
low bits and fail an exact value-hash compare. Casting each operand to a
decimal whose scale comfortably exceeds the data's true decimal precision
makes the sum exact (decimal arithmetic is associative), and the final
decimal→double cast is deterministic — both engines produce bit-identical
results in any execution order. This is also the right 100 TB posture:
partial map-side aggregation stays enabled and results don't drift with the
partition count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale=6 covers all testdata columns (prices/discounts have ≤2 true
# decimals; price*(1±disc)(1±tax) products have ≤6) with headroom against
# double representation error; precision 38 avoids overflow at 100 TB row
# counts (sum of 1e12 values of 1e6 magnitude fits in 38-6=32 digits).
EXACT_PRECISION = 38
EXACT_SCALE = 6


def _dec(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({EXACT_PRECISION},{scale})")


def exact_sum(col: Column | str, scale: int = EXACT_SCALE) -> Column:
    """Order-independent SUM over doubles; returns double."""
    return F.sum(_dec(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = EXACT_SCALE) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_dec(c, scale)).cast("double") / F.count(c)


def exact_sum_sql(expr: str, scale: int = EXACT_SCALE) -> str:
    """Oracle-side twin of :func:`exact_sum` (identical ANSI SQL semantics)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({EXACT_PRECISION},{scale}))) AS DOUBLE)"


def exact_avg_sql(expr: str, scale: int = EXACT_SCALE) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({EXACT_PRECISION},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def zero_default_cast(col: Column | str, dtype: str = "int") -> Column:
    """Numeric cast with the reference's silent-zero default (flowlog.go:59-90)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast(dtype), F.lit(0).cast(dtype))
