"""Streaming flow-log converter — the reference's Lambda-per-event loop
(main.go:67-85, SURVEY §3.1) as one long-lived Structured Streaming query.

Reference posture: one Lambda invocation per S3 notification, concurrency
capped at 5 (template.yml:35-37,61-62), errors swallowed → **at-most-once**
(main.go:77-83). Spark-first posture: a file-source streaming query over
the drop directory with ``maxFilesPerTrigger`` as the concurrency analogue,
checkpoint + idempotent dynamic-partition writes → **exactly-once per
micro-batch** — a deliberate upgrade documented in SURVEY §7.

The per-batch body reuses the exact batch operators (parse → dt/account →
partitioned parquet; operators/convert.py), so batch and streaming cannot
drift semantically — the Kappa-architecture property Structured Streaming
is built around.
"""

from __future__ import annotations

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.convert import with_partition_columns
from ..schema import PARTITION_COLUMNS
from ..sources.flowlog import parse_flowlog_lines


def start_flowlog_stream(
    spark: SparkSession,
    src_dir: str,
    dst_path: str,
    checkpoint_dir: str,
    table: str | None = None,
    max_files_per_trigger: int = 5,
) -> StreamingQuery:
    """Watch ``src_dir`` for flow-log text files; convert each micro-batch.

    ``max_files_per_trigger=5`` mirrors the reference's reserved
    concurrency of 5 Lambdas (template.yml:61-62). Partition registration
    (the reference's per-key ALTER TABLE, main.go:175-196) happens inside
    ``foreachBatch`` against the session catalog when ``table`` is given.
    """
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(src_dir)
    )
    parsed = with_partition_columns(parse_flowlog_lines(lines)).drop("start_time")

    def write_batch(batch_df, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        # partition keys ride the write as a CollectMetrics observation —
        # the second micro-batch scan the round-1 distinct().collect() paid
        # is gone (same single-pass contract as the batch converter)
        obs = Observation()
        batch_df = batch_df.observe(
            obs, F.collect_set(F.struct(*PARTITION_COLUMNS)).alias("pkeys")
        )
        prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.repartition(*PARTITION_COLUMNS)
                .write.mode("append")
                .partitionBy(*PARTITION_COLUMNS)
                .parquet(dst_path, compression="snappy")
            )
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if table is not None:
            for row in sorted((r["dt"], r["account"]) for r in obs.get["pkeys"]):
                sess.sql(
                    f"ALTER TABLE {table} ADD IF NOT EXISTS "
                    f"PARTITION (dt='{row[0]}', account='{row[1]}')"
                )

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
