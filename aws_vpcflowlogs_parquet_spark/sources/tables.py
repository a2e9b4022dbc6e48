"""Analytic-table loader for the driver testdata (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. The loader is
deliberately thin — ``spark.read.parquet`` already gives vectorized scans,
predicate pushdown, and column pruning; anything more would fight Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
    # reader rejects; with spark.sql.legacy.parquet.nanosAsLong (set in
    # session posture) it surfaces as a long we convert to a microsecond
    # timestamp here (integer div — no double round-trip at 2^63 scale).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for ``spark.sql`` queries."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
