"""Source-format robustness: the strict/lenient duality the flow-log
parser implements (sources/flowlog.py) must hold for the other
ingestion formats too — malformed input is either quarantined per-row
(PERMISSIVE + corrupt-record column), fails the job (FAILFAST), or is
skipped per-file (ignoreCorruptFiles), each an explicit choice."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def _write_csv(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,0.5\n"
        "not_a_number,beta,0.25\n"  # id fails the long cast
        "3,gamma,0.75\n"
    )
    return str(p)


def test_csv_permissive_quarantines_bad_rows(spark, tmp_path):
    path = _write_csv(tmp_path)
    df = (
        spark.read.schema(CSV_SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .cache()  # querying only the corrupt column is disallowed on raw scans
    )
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert [r["id"] for r in good.orderBy("id").collect()] == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt"]


def test_csv_failfast_raises(spark, tmp_path):
    path = _write_csv(tmp_path)
    df = (
        spark.read.schema(CSV_SCHEMA)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_corrupt_parquet_file_skip_vs_fail(spark, tmp_path):
    out = str(tmp_path / "tbl")
    spark.range(100).select(F.col("id")).repartition(4).write.parquet(out)
    victim = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    size = os.path.getsize(victim)
    with open(victim, "r+b") as f:  # destroy the footer
        f.truncate(size // 2)

    # explicit schema: footer-based inference would die on the corrupt
    # footer BEFORE the scan-level skip policy can apply
    schema = T.StructType([T.StructField("id", T.LongType())])
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        n = spark.read.schema(schema).parquet(out).count()
        assert 0 < n < 100  # the healthy files' rows survive
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")

    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(out).count()


def test_parquet_schema_evolution_merge_vs_pinned(spark, tmp_path):
    """Schema evolution across partitions: a Hive-layout table whose
    later partitions carry a NEW column (the flow-log v3+ situation —
    the reference hard-rejects other versions, flowlog.go:43-48; the
    Spark engine's documented extension path is mergeSchema). Three
    contracts: (a) mergeSchema=True unions the schemas and backfills
    nulls for old partitions; (b) a pinned explicit schema keeps a
    stable projection regardless of what newer files carry; (c) the
    default single-footer inference is NOT guaranteed to see the new
    column — which is why production readers must choose (a) or (b)
    explicitly."""
    base = str(tmp_path / "evolve")
    spark.range(5).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    ).write.parquet(f"{base}/dt=2024-01-01")
    spark.range(5, 10).select(
        F.col("id"),
        (F.col("id") * 2).alias("value"),
        F.lit("tcp").alias("proto"),
    ).write.parquet(f"{base}/dt=2024-01-02")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "value", "proto", "dt"}
    assert merged.count() == 10
    # old partition rows surface the evolved column as NULL
    assert (
        merged.filter(F.col("dt") == "2024-01-01")
        .filter(F.col("proto").isNull())
        .count()
        == 5
    )
    assert (
        merged.filter(F.col("dt") == "2024-01-02")
        .filter(F.col("proto") == "tcp")
        .count()
        == 5
    )

    from pyspark.sql import types as TT

    pinned = TT.StructType(
        [
            TT.StructField("id", TT.LongType()),
            TT.StructField("value", TT.LongType()),
        ]
    )
    stable = spark.read.schema(pinned).parquet(base)
    # the pinned schema governs DATA columns; partition discovery still
    # appends the dt directory column — evolved data columns (proto)
    # stay invisible, which is the stability contract
    assert stable.columns == ["id", "value", "dt"]
    assert stable.count() == 10
