"""foreachBatch incremental-dedup sink — the streaming upsert pattern.

`dropDuplicatesWithinWatermark` (streaming/windows.py) bounds its state
by the watermark: a duplicate arriving AFTER the horizon is re-admitted.
Pipelines that need *forever* dedup (ingest-once semantics over months of
backfill) instead keep the seen-key set as a TABLE and let each
micro-batch join against it — state lives in the lake, not the state
store, so it survives checkpoints, scales past executor memory, and is
queryable/compactable like any other table.

Per micro-batch (the classic Delta MERGE loop, expressed on plain
parquet):

1. collapse duplicates WITHIN the batch (row_number over an explicit
   total order — deterministic survivor);
2. anti-join the 16-byte key-hash state table (never the payload);
3. append the survivors to the output, partitioned by ``batch_id`` and
   written with dynamic partition overwrite — a retried batch REPLACES
   its own partition instead of duplicating it (idempotence under
   foreachBatch's at-least-once contract);
4. append the survivors' hashes to the state table the same way.

At 100 TB the state table is bucketed/clustered on the hash so step 2 is
a co-located join; here it is plain parquet with the identical plan
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _key_hash(keys: list[str]) -> F.Column:
    return F.md5(F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys]))


def start_incremental_dedup_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    order: list[str],
):
    """Start the stream; returns the StreamingQuery. ``order`` is the
    total order picking the within-batch survivor per key."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        w = Window.partitionBy(*keys).orderBy(*order)
        collapsed = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_kh", _key_hash(keys))
        )
        try:
            seen = sp.read.parquet(state_dir).select("_kh")
            # no broadcast hint: the state table GROWS without bound, so
            # the join strategy must stay AQE's runtime call (broadcast
            # while small, shuffled/co-located once it isn't)
            fresh = collapsed.join(seen, "_kh", "left_anti")
        except Exception:  # first batch: no state yet
            fresh = collapsed
        fresh = fresh.withColumn("batch_id", F.lit(batch_id)).persist()
        (
            fresh.drop("_kh")
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            fresh.select("_kh", "batch_id")
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )
        fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
