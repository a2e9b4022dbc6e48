"""Vector column API (functions/vectors.py): the codegen'd fold and the
Arrow-batched pandas-UDF fallback must compute the same cosine (to BLAS
summation-order tolerance), and the fold must bit-match the expression
strings the similarity operators/oracles use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.functions.vectors import (
    cosine_pandas_udf,
    cosine_similarity,
    to_double_array,
)
from aws_vpcflowlogs_parquet_spark.operators.similarity import cosine_expr
from aws_vpcflowlogs_parquet_spark.sources.tables import load_table

from .conftest import SF_DIR


def _pairs(spark, n=64):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("e")
    )
    a = emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea")
    )
    b = emb.filter((F.col("vec_id") >= n) & (F.col("vec_id") < 2 * n)).select(
        (F.col("vec_id") - n).alias("id_a"), F.col("e").alias("eb")
    )
    return a.join(b, "id_a")


def test_column_api_matches_expr_strings(spark):
    # the Column-API fold and the SQL-string form (used by operators +
    # oracles) must be the SAME expression — bit-identical results
    rows = (
        _pairs(spark)
        .withColumn("c_api", cosine_similarity(F.col("ea"), F.col("eb")))
        .withColumn("c_expr", F.expr(cosine_expr("ea", "eb")))
        .select("c_api", "c_expr")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["c_api"] == r["c_expr"]


def test_pandas_udf_agrees_with_native_fold(spark):
    # numpy/BLAS sums pairwise, the fold sums left-to-right: equal only to
    # summation-order tolerance, which is all the fallback promises
    cos = cosine_pandas_udf()
    rows = (
        _pairs(spark)
        .withColumn("c_native", cosine_similarity(F.col("ea"), F.col("eb")))
        .withColumn("c_pandas", cos(F.col("ea"), F.col("eb")))
        .select("c_native", "c_pandas")
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["c_native"] - r["c_pandas"]) < 1e-9
