"""Batch flow-log converter — the reference's entire job as one Spark plan.

Reference pipeline (convert.go:41-95 + main.go:152-196, SURVEY §3.2):
read S3 gzip lines → parse/validate → derive partition key
(date(event_time), account) → fan out to per-partition Parquet writers →
upload → register each distinct partition in the catalog via
``ALTER TABLE … ADD IF NOT EXISTS PARTITION``.

Spark-first re-expression, one declarative plan:

    read.text → parse (codegen'd expressions) → withColumn dt/account
    → repartition('dt','account') → write.partitionBy('dt','account').parquet

Design decisions (SURVEY §4):

- **Hive layout** ``dt=YYYY-MM-DD/account=NNN/`` instead of the reference's
  ``logs/{acct}/{Y}/{M}/{D}/`` (convert.go:29-31). The reference needs
  explicit per-partition DDL (main.go:177) *because* its layout is not
  discoverable; Hive layout makes partition registration a metadata listing
  (``MSCK``-able) and enables Spark partition pruning directly.
- **repartition before write**: the reference writes one file per
  (source file × partition key) (convert.go:86) — a small-file generator at
  100 TB. Shuffling on the partition key first bounds output files to one
  per (partition, shuffle-task) and keeps each writer's 128 MB row-group
  buffer count low (the reference's real memory hazard, parquet.go:34).
- **Idempotence**: dynamic partition overwrite replaces exactly the
  partitions present in this batch — the scalable analogue of the
  reference's deterministic output key per source file (convert.go:86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import PARTITION_COLUMNS
from ..sources.flowlog import read_flowlog_text


def with_partition_columns(df: DataFrame) -> DataFrame:
    """Derive (dt, account) from event time + accountid (convert.go:13-27)."""
    return df.withColumn(
        "dt", F.date_format(F.col("start_time"), "yyyy-MM-dd")
    ).withColumn("account", F.col("accountid"))


def convert_flowlogs(
    spark: SparkSession,
    src_paths: list[str] | str,
    dst_path: str,
    strict: bool = True,
    overwrite_partitions: bool = True,
) -> list[tuple[str, str]]:
    """Convert raw flow-log text files into the partitioned Parquet table.

    Returns the distinct partition keys written, mirroring the reference's
    result{partitionKeys} (convert.go:37-39, main.go:169-172).
    """
    parsed = read_flowlog_text(spark, src_paths, strict=strict)
    partitioned = with_partition_columns(parsed).drop("start_time")

    mode = "overwrite" if overwrite_partitions else "append"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            partitioned.repartition(*PARTITION_COLUMNS)
            .write.mode(mode)
            .partitionBy(*PARTITION_COLUMNS)
            .parquet(dst_path, compression="snappy")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # distinct partition-key set (reference pkeySet, main.go:153,169-172)
    keys = (
        partitioned.select(*PARTITION_COLUMNS)
        .distinct()
        .orderBy(*PARTITION_COLUMNS)
        .collect()
    )
    return [(r["dt"], r["account"]) for r in keys]


def compact_partitions(spark: SparkSession, src_path: str, dst_path: str) -> int:
    """Rewrite a partitioned flow-log table to one file per partition key.

    The reference emits one output file per (source file × partition key)
    (convert.go:86) — at 100 TB that's millions of small files, the classic
    scan killer. Compaction is one shuffle keyed on the partition columns
    (every row of a key lands in one task → exactly one output file per
    key). Spark cannot overwrite a path it is reading, so the compacted
    table lands at ``dst_path``; callers swap locations (or repoint the
    table's LOCATION) atomically. Returns the partition count.

    At cluster scale, run per dt-range so the shuffle stays bounded, and
    raise the per-key file count by salting the repartition key when a
    single partition exceeds a task's output budget.
    """
    df = spark.read.parquet(src_path)
    (
        df.repartition(*PARTITION_COLUMNS)
        .write.mode("overwrite")
        .partitionBy(*PARTITION_COLUMNS)
        .parquet(dst_path, compression="snappy")
    )
    return df.select(*PARTITION_COLUMNS).distinct().count()


def register_flowlog_table(
    spark: SparkSession,
    table: str,
    location: str,
    partitions: list[tuple[str, str]] | None = None,
) -> None:
    """Catalog registration (reference main.go:175-196, template.yml:116-168).

    Creates the external partitioned table if needed, then registers
    partitions. With Hive layout the bulk path is ``MSCK REPAIR`` /
    ``recoverPartitions``; the explicit per-key ``ALTER TABLE … ADD IF NOT
    EXISTS PARTITION`` path is kept for parity with the reference's DDL
    (main.go:177) and for selective registration.
    """
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
          version INT, accountid STRING, interfaceid STRING,
          srcaddr STRING, dstaddr STRING, srcport INT, dstport INT,
          protocol INT, packets INT, bytes INT,
          start_ts BIGINT, end_ts BIGINT, action STRING, logstatus STRING
        )
        USING PARQUET
        PARTITIONED BY (dt STRING, account STRING)
        LOCATION '{location}'
        """
    )
    if partitions is None:
        spark.sql(f"MSCK REPAIR TABLE {table}")
        return
    for dt, account in partitions:
        # one DDL per distinct key, exactly the reference's statement shape
        spark.sql(
            f"ALTER TABLE {table} ADD IF NOT EXISTS "
            f"PARTITION (dt='{dt}', account='{account}')"
        )
