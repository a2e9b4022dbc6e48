"""Streaming CDC APPLY — maintain a keyed snapshot table from a change
stream (the foreachBatch MERGE loop; Delta's `MERGE INTO` on plain
parquet).

Each micro-batch of change rows (op ∈ {I, U, D}, a business key, a
change timestamp) is collapsed to its latest change per key (explicit
total order — late-arriving duplicates lose deterministically) and
merged into the current snapshot:

    key only in snapshot        → carried through
    latest change is I/U        → new/updated row wins
    latest change is D          → row dropped

Snapshots are written as VERSIONED directories (v000001, v000002, …)
with an atomic pointer advance (directory rename), so readers always
see a complete version and older versions remain queryable — parquet
"time travel" by construction, and the idempotence story under
foreachBatch retries: re-processing batch N rewrites the same version
number rather than corrupting the pointer chain.

At 100 TB the snapshot and the change batch hash-join on the key — one
shuffle per batch, both sides scale out; bucketing the snapshot on the
key makes the merge co-located. The versioned-directory scheme is what
table formats (Delta/Iceberg) formalize with manifest files.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def current_version(base: str) -> int:
    vs = sorted(glob.glob(os.path.join(base, "v*")))
    return int(os.path.basename(vs[-1])[1:]) if vs else 0


def read_snapshot(spark: SparkSession, base: str, version: int | None = None):
    """Read the snapshot at ``version`` (default: latest) — time travel."""
    v = version if version is not None else current_version(base)
    if v == 0:
        return None
    return spark.read.parquet(os.path.join(base, f"v{v:06d}"))


def apply_changes(
    snapshot: DataFrame | None,
    changes: DataFrame,
    keys: list[str],
    order: list[str],
) -> DataFrame:
    """Pure merge kernel: latest change per key applied over snapshot."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col("op") != "D").drop("op")
    deletes = latest.filter(F.col("op") == "D").select(*keys)
    if snapshot is None:
        return upserts
    untouched = snapshot.join(
        latest.select(*keys), keys, "left_anti"
    )
    return untouched.unionByName(upserts).join(deletes, keys, "left_anti")


def start_cdc_apply_stream(
    spark: SparkSession,
    change_stream: DataFrame,
    snapshot_base: str,
    checkpoint: str,
    keys: list[str],
    order: list[str],
):
    """Drive the change stream into versioned snapshots; returns the
    StreamingQuery (availableNow — drain and exit)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        snap = read_snapshot(sp, snapshot_base)
        merged = apply_changes(snap, batch, keys, order).persist()
        merged.count()  # settle before the old version's files are shadowed
        v_next = current_version(snapshot_base) + 1
        tmp = os.path.join(snapshot_base, f"_tmp_v{v_next:06d}_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        merged.unpersist()
        final = os.path.join(snapshot_base, f"v{v_next:06d}")
        if os.path.exists(final):  # retried batch: replace, don't duplicate
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)

    return (
        change_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
