"""Vector math over ``array<float>`` embedding columns — JVM-side only.

The reference has no vector operators (its last data-bearing line is
parquet.go:55); these back the similarity-search extension (SURVEY §2.4).
Everything is built from Spark higher-order functions (``zip_with`` +
``aggregate``), which run inside codegen — no Python UDF on the hot path, so
the same expressions scale to 100 TB without Arrow serialization cost.

Floats are widened to double *before* any arithmetic so Spark and the DuckDB
oracle (which also multiplies/sums in double, left-to-right) produce
bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — sequential left-to-right fold (matches the SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
