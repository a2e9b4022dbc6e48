"""Property-based determinism tests for the exact aggregation helpers
(functions/casts.py): for arbitrary doubles — negatives, many decimal
places, magnitude spread — exact_sum must (a) be invariant to partition
count / execution order and (b) equal the DuckDB twin bit-for-bit. This
is the contract the whole oracle gate leans on; hypothesis hunts the
quantization edge cases (ulp-adjacent halves, negative half-rounding)
that fixed fixtures miss.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from aws_vpcflowlogs_parquet_spark.functions.casts import (
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)

VALUES = st.lists(
    st.one_of(
        st.floats(
            min_value=-9e10, max_value=9e10, allow_nan=False, allow_infinity=False
        ),
        st.decimals(
            min_value=-1000, max_value=1000, places=2
        ).map(float),
    ),
    min_size=1,
    max_size=60,
)


@given(vals=VALUES, parts=st.sampled_from([1, 3, 7]))
# regression: DuckDB's wide-decimal->double cast misrounds this negative
# >53-bit value; the helpers route the final cast through BIGINT instead
@example(vals=[-9007199255.71875], parts=1)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_sum_matches_duckdb_at_any_partitioning(spark, vals, parts):
    schema = StructType([StructField("x", DoubleType())])
    df = spark.createDataFrame([(v,) for v in vals], schema).repartition(parts)
    got = df.agg(
        exact_sum("x").alias("s"), exact_avg("x").alias("a")
    ).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        f"SELECT {exact_sum_sql('x')} AS s, {exact_avg_sql('x')} AS a FROM t"
    ).fetchone()
    assert got["s"] == want[0], (vals, parts)
    assert got["a"] == want[1], (vals, parts)
