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


def cosine_pandas_udf():
    """Arrow-batched scalar pandas UDF twin of :func:`cosine_similarity`.

    The escape hatch for vector semantics that outgrow higher-order
    functions (learned metrics, library calls): whole Arrow batches cross
    into numpy once per batch, never row-at-a-time Python. Deliberately
    NOT used by the catalog queries — the native fold is faster (no
    serialization) and bit-matches the SQL oracle, while BLAS-backed
    numpy sums in a different order (equal only to ~1e-12, asserted in
    tests/test_vectors.py). Returns the UDF; import cost deferred so the
    module stays importable without pandas.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cos(a, b):
        out = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            out[i] = (xv @ yv) / (np.sqrt(xv @ xv) * np.sqrt(yv @ yv))
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints into names pyspark can't resolve here
    cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(cos, "double")
