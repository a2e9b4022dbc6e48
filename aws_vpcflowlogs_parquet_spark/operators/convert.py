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
  ``src_partition=True`` restores the reference's *per-source-file*
  granularity (see convert_flowlogs docstring).
- **Single pass**: strict validation and the distinct partition-key set
  both ride the write job as CollectMetrics observations — the source is
  scanned exactly once (the reference also single-passes, convert.go:41-95;
  our round-1 strict probe paid a second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..schema import PARTITION_COLUMNS
from ..sources.flowlog import (
    FlowLogParseError,
    parse_flowlog_lines_observed,
    raise_if_malformed,
)

# per-source-file partition column (src_partition mode): short content-free
# hash of the input file path, the analogue of the reference's
# source-derived output object key (convert.go:86)
SRC_COLUMN = "src"


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
    src_partition: bool = False,
    source: str = "text",
) -> list[tuple[str, ...]]:
    """Convert raw flow-log text files into the partitioned Parquet table.

    Returns the distinct partition keys written, mirroring the reference's
    result{partitionKeys} (convert.go:37-39, main.go:169-172): ``(dt,
    account)`` tuples, or ``(dt, account, src)`` with ``src_partition=True``
    so they register cleanly against the 3-level table.

    Re-run granularity (reference R14, convert.go:86): with the default
    layout, dynamic overwrite replaces the *whole* (dt, account) partition
    — re-converting one source file of a multi-file partition drops the
    other files' rows. When one partition accumulates from many source
    files over time, either use ``overwrite_partitions=False`` (append;
    re-runs duplicate — follow with :func:`compact_partitions` dedup) or
    ``src_partition=True``, which adds a third partition level
    ``src=<hash(source file)>`` so dynamic overwrite replaces exactly the
    re-converted file's own output — the reference's per-source-file
    idempotence, expressed as partition layout. Register such tables with
    ``register_flowlog_table(..., src_partitioned=True)``.

    Strict mode is single-pass: the malformed-line counter rides the write
    job as an observation, and the error is raised *after* the write
    (valid rows of the failing batch are already written; a re-run of the
    corrected input overwrites them idempotently). This diverges from the
    reference's write-nothing abort (convert.go:48-50) in exchange for
    not scanning 100 TB of source twice.

    ``source="datasource"`` runs the same conversion through the
    pluggable Python DataSource (sources/flowlog_datasource.py — the
    rlogs.Read contract as one registered format). There strict parsing
    aborts the TASK, so the write commit protocol discards all output —
    the reference's write-nothing abort exactly, at Python-worker speed
    (the pluggability surface; "text" remains the codegen hot path).
    ``src_partition`` requires the text source: ``input_file_name()``
    is empty inside a Python DataSource scan.
    """
    if isinstance(src_paths, str):
        src_paths = [src_paths]
    parse_obs = None
    if source == "datasource":
        if src_partition:
            raise ValueError(
                "src_partition requires source='text' "
                "(input_file_name() is empty in a Python DataSource scan)"
            )
        from functools import reduce

        from ..sources.flowlog_datasource import register_flowlog_source

        register_flowlog_source(spark)
        parsed = reduce(
            DataFrame.unionAll,
            [
                spark.read.format("flowlog")
                .option("strict", str(bool(strict)).lower())
                .load(p)
                for p in src_paths
            ],
        )
    else:
        lines = spark.read.text(src_paths)
        parsed, parse_obs = parse_flowlog_lines_observed(lines)
    partitioned = with_partition_columns(parsed).drop("start_time")

    part_cols = list(PARTITION_COLUMNS)
    if src_partition:
        partitioned = partitioned.withColumn(
            SRC_COLUMN, F.substring(F.sha2(F.input_file_name(), 256), 1, 12)
        )
        part_cols.append(SRC_COLUMN)

    # distinct partition-key set (reference pkeySet, main.go:153,169-172)
    # collected as an observation: bounded metadata (days × accounts[× src
    # files]), no second scan of the source. The observed struct carries
    # the FULL key — with src_partition the table is 3-level partitioned
    # and ALTER TABLE rejects partial (dt, account) specs, so registration
    # needs (dt, account, src) tuples.
    key_obs = Observation()
    partitioned = partitioned.observe(
        key_obs, F.collect_set(F.struct(*part_cols)).alias("pkeys")
    )

    mode = "overwrite" if overwrite_partitions else "append"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            partitioned.repartition(*part_cols)
            .write.mode(mode)
            .partitionBy(*part_cols)
            .parquet(dst_path, compression="snappy")
        )
    except Exception as exc:  # noqa: BLE001 — surface the source's abort
        # datasource-strict parse failures abort the task and the commit
        # protocol discards the write (the reference's write-nothing
        # abort); re-raise under the parser's typed error. Match the
        # stable error-code token first — Py4J/connect chains can
        # truncate or re-wrap the worker's prose, but the short marker
        # survives (ADVICE r8); the message substring stays as a
        # fallback for older wrappers that keep only the tail.
        from ..sources.flowlog_datasource import ERROR_CODE

        msg = str(exc)
        if ERROR_CODE in msg or "malformed flow log line" in msg:
            raise FlowLogParseError(msg) from exc
        raise
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    keys = sorted(tuple(r[c] for c in part_cols) for r in key_obs.get["pkeys"])
    if strict and parse_obs is not None:
        try:
            raise_if_malformed(parse_obs)
        except FlowLogParseError as err:
            # Single-pass strict raises AFTER the write: valid rows of the
            # failing batch are already on disk. Attach the written keys so
            # callers (handler.run_event) can register them before
            # propagating — otherwise the partial state is invisible until
            # a corrected re-run.
            err.partition_keys = keys
            raise
    return keys


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
    if SRC_COLUMN in df.columns:
        # src-partitioned layout (per-source-file idempotence): compaction
        # is exactly the step that retires the per-file granularity
        df = df.drop(SRC_COLUMN)
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
    partitions: list[tuple[str, str]] | list[tuple[str, str, str]] | None = None,
    src_partitioned: bool = False,
) -> None:
    """Catalog registration (reference main.go:175-196, template.yml:116-168).

    Creates the external partitioned table if needed, then registers
    partitions. With Hive layout the bulk path is ``MSCK REPAIR`` /
    ``recoverPartitions``; the explicit per-key ``ALTER TABLE … ADD IF NOT
    EXISTS PARTITION`` path is kept for parity with the reference's DDL
    (main.go:177) and for selective registration.

    ``partitions`` entries are ``(dt, account)`` for Hive-layout
    directories under ``location``, or ``(dt, account, path)`` to register
    an explicit ``LOCATION`` — the reference always emits one
    (main.go:177) because its ``logs/{acct}/{Y}/{M}/{D}/`` layout is not
    Hive-discoverable; the explicit form keeps parity for externally-laid-
    out tables. ``src_partitioned`` matches tables written with
    ``convert_flowlogs(..., src_partition=True)``; its entries carry the
    third key level — ``(dt, account, src)`` or ``(dt, account, src,
    path)`` — because Spark rejects partial specs against a 3-level
    table (``AnalysisException: spec (dt, account) must match (dt,
    account, src)``). Entries missing the ``src`` element fall back to
    one ``MSCK REPAIR`` for the whole table rather than failing after
    the data is already written.
    """
    part_spec = "dt STRING, account STRING" + (
        f", {SRC_COLUMN} STRING" if src_partitioned else ""
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
          version INT, accountid STRING, interfaceid STRING,
          srcaddr STRING, dstaddr STRING, srcport INT, dstport INT,
          protocol INT, packets INT, bytes INT,
          start_ts BIGINT, end_ts BIGINT, action STRING, logstatus STRING
        )
        USING PARQUET
        PARTITIONED BY ({part_spec})
        LOCATION '{location}'
        """
    )
    if partitions is None:
        spark.sql(f"MSCK REPAIR TABLE {table}")
        return
    key_len = 3 if src_partitioned else 2
    if src_partitioned and any(len(e) < key_len for e in partitions):
        # partial specs can't register against the 3-level table; data is
        # already written, so recover everything via metadata listing
        spark.sql(f"MSCK REPAIR TABLE {table}")
        return
    for entry in partitions:
        # one DDL per distinct key, exactly the reference's statement shape
        spec = ", ".join(
            f"{col}='{val}'"
            for col, val in zip(("dt", "account", SRC_COLUMN), entry[:key_len])
        )
        loc = f" LOCATION '{entry[key_len]}'" if len(entry) > key_len else ""
        spark.sql(
            f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({spec}){loc}"
        )
